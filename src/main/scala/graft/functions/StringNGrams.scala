package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram STRINGS of an `array<string>` of words, one tight loop per
  * row inside whole-stage codegen.
  *
  * Semantically equivalent to
  * `transform(sequence(1, size(ws) - n + 1), i -> concat_ws(' ', slice(ws, i, n)))`
  * but without the interpreted higher-order-function walk per element
  * (Catalyst evaluates lambda expressions one boxed tree-walk per array
  * element — the same cost [[HashShingles]] eliminates for hashed grams).
  * Grams are emitted in document order, duplicates kept; emit strings
  * (not hashes) when the consumer must be reproducible by an external
  * SQL engine verbatim — e.g. the decontamination oracle.
  */
case class StringNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "string_ngrams"

  override def nullSafeEval(input: Any): Any =
    StringNGrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StringNGrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): StringNGrams =
    copy(child = newChild)
}

object StringNGrams {
  private val Space = ' '.toByte

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val w = arr.numElements()
    val m = w - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val words = new Array[Array[Byte]](w)
    var i = 0
    while (i < w) {
      val u = arr.getUTF8String(i)
      words(i) = if (u == null) Array.emptyByteArray else u.getBytes
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      var len = n - 1 // the n-1 joining spaces
      var j = 0
      while (j < n) { len += words(i + j).length; j += 1 }
      val buf = new Array[Byte](len)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(p) = Space; p += 1 }
        val wb = words(i + j)
        System.arraycopy(wb, 0, buf, p, wb.length)
        p += wb.length
        j += 1
      }
      out(i) = UTF8String.fromBytes(buf)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Word n-gram strings of an array<string> column, document order. */
  def ngrams(words: Column, n: Int): Column =
    GraftSqlBridge.column(
      StringNGrams(GraftSqlBridge.expression(words), n))
}
