package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** llamadb type-name mapping (SURVEY §1.3: unsigned widths → smallest
  * containing signed type; u64 → DECIMAL(20,0)) and INSERT defaults
  * (`types/mod.rs:68-94`). Pure driver-side — no Spark session. */
class TypeMapperSpec extends AnyFunSuite {

  test("unsigned widths map to the smallest containing signed type") {
    assert(TypeMapper.toSpark("byte") == ShortType)
    assert(TypeMapper.toSpark("U8") == ShortType)
    assert(TypeMapper.toSpark("u16") == IntegerType)
    assert(TypeMapper.toSpark("u32") == LongType)
    assert(TypeMapper.toSpark("u64") == DecimalType(20, 0))
  }

  test("signed widths, aliases, floats, strings") {
    assert(TypeMapper.toSpark("i8") == ByteType)
    assert(TypeMapper.toSpark("i32") == IntegerType)
    assert(TypeMapper.toSpark("INT") == IntegerType)
    assert(TypeMapper.toSpark("i64") == LongType)
    assert(TypeMapper.toSpark("F64") == DoubleType)
    assert(TypeMapper.toSpark("double") == DoubleType)
    assert(TypeMapper.toSpark("STRING") == StringType)
    assert(TypeMapper.toSpark("varchar(30)") == StringType)
  }

  test("byte[] and byte[N] map to BinaryType") {
    assert(TypeMapper.toSpark("byte[]") == BinaryType)
    assert(TypeMapper.toSpark("byte[16]") == BinaryType)
  }

  test("fixedByteLength parses byte[N]/byte(N) only") {
    assert(TypeMapper.fixedByteLength("byte[16]") == Some(16))
    assert(TypeMapper.fixedByteLength("BYTE(4)") == Some(4))
    assert(TypeMapper.fixedByteLength("byte[]") == None)
    assert(TypeMapper.fixedByteLength("byte") == None)
    assert(TypeMapper.fixedByteLength("string") == None)
  }

  test("unknown types error like the reference (types/mod.rs:64)") {
    intercept[TypeMapper.TypeError] { TypeMapper.toSpark("uuid") }
    intercept[TypeMapper.TypeError] { TypeMapper.toSpark("json") }
  }

  test("byte[N] spelling parses through the dialect front end") {
    import graft.sqlfront.Ast
    val stmt = graft.sqlfront.Parser.parse(
      "CREATE TABLE b (payload byte[16], blob byte[], n U64)")
    val Ast.CreateTable(_, cols) = stmt: @unchecked
    assert(cols.map(_.typeName) == Seq("byte[16]", "byte[]", "u64"))
    cols.foreach(c => TypeMapper.toSpark(c.typeName)) // all mappable
  }

  test("defaults: zero / empty / NULL-if-nullable (types/mod.rs:68-94)") {
    assert(TypeMapper.defaultValue(IntegerType, nullable = false) == 0)
    assert(TypeMapper.defaultValue(DoubleType, nullable = false) == 0.0)
    assert(TypeMapper.defaultValue(StringType, nullable = false) == "")
    assert(TypeMapper.defaultValue(BinaryType, nullable = false)
      .asInstanceOf[Array[Byte]].isEmpty)
    assert(TypeMapper.defaultValue(IntegerType, nullable = true) == null)
  }
}
