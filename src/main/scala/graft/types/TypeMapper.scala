package graft.types

import org.apache.spark.sql.types._

/** llamadb declared-type names → Spark DataTypes (SURVEY.md §1.3).
  *
  * Unsigned widths map to the smallest SIGNED Spark type that contains
  * the full unsigned range (Spark has no unsigned types); `u64` needs
  * DECIMAL(20,0). `F64`/double forbids NaN in the reference — enforced
  * at insert, not in the type. Reference parsing rules:
  * `src/types/mod.rs:31-66`.
  */
object TypeMapper {

  case class TypeError(msg: String) extends RuntimeException(msg)

  /** Parse a llamadb type name into (Spark type, default value for
    * missing INSERT columns — reference `types/mod.rs:68-94`). */
  def toSpark(name: String): DataType = {
    val t = name.toLowerCase.trim
    t match {
      case "null"                    => NullType
      case "byte"  | "u8"            => ShortType      // unsigned 8 → i16
      case "u16"                     => IntegerType    // unsigned 16 → i32
      case "u24" | "u32"             => LongType       // ≤ unsigned 32 → i64
      case "u40" | "u48" | "u56"     => LongType
      case "u64"                     => DecimalType(20, 0)
      case "i8"                      => ByteType
      case "i16"                     => ShortType
      case "i24" | "i32" | "int" | "integer" => IntegerType
      case "i40" | "i48" | "i56" | "i64"     => LongType
      case "f64" | "double"          => DoubleType
      case "string" | "varchar" | "text" => StringType
      case s if s.startsWith("varchar(") => StringType
      // byte[] dynamic and byte[N] fixed both map to BinaryType; the
      // reference enforces the fixed length at insert (`variant.rs:88-94`)
      case s if s.startsWith("byte(") || s.startsWith("byte[") => BinaryType
      case other => throw TypeError(s"unknown column type '$other'")
    }
  }

  /** Fixed length N of a `byte[N]` / `byte(N)` column type, if any —
    * the reference enforces it at insert (`variant.rs:88-94`). */
  def fixedByteLength(name: String): Option[Int] = {
    val t = name.toLowerCase.trim
    val m = "^byte[\\[(](\\d+)[\\])]$".r.findFirstMatchIn(t)
    m.map(_.group(1).toInt)
  }

  /** Type-specific default for columns omitted from INSERT
    * (reference `types/mod.rs:68-94` + `tempdb/mod.rs:264-268`):
    * zero for numbers, empty string/bytes, NULL if nullable. */
  def defaultValue(dt: DataType, nullable: Boolean): Any =
    if (nullable) null
    else dt match {
      case ByteType      => 0.toByte
      case ShortType     => 0.toShort
      case IntegerType   => 0
      case LongType      => 0L
      case _: DecimalType => java.math.BigDecimal.ZERO
      case DoubleType    => 0.0
      case StringType    => ""
      case BinaryType    => Array.empty[Byte]
      case _             => null
    }
}
