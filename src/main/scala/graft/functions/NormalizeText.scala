package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftSqlBridge

/** Single-pass text normalization, value-identical to the regex chain
  * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", " "),
  * " +", " "))` that it replaces (the chain runs three Java-regex passes
  * per document and dominates every normalize-fed stage: fingerprint,
  * minhash, simhash, jaccard, top-terms).
  *
  * Equivalence argument: lowercase first (UTF8String.toLowerCase — the
  * same locale-independent lowering Spark's `lower` uses). In the
  * lowered bytes, `[a-z0-9]` are single ASCII bytes; every other BYTE
  * (including each byte of a multi-byte UTF-8 character) is outside the
  * class and maps to a space. The regex maps each non-matching
  * CHARACTER to one space, so byte-wise replacement can only produce
  * MORE consecutive spaces — and both pipelines then collapse space
  * runs and trim, erasing the difference. The scan emits alnum bytes
  * directly and a single pending space between alnum groups: collapse +
  * trim in the same pass.
  */
object NormalizeText {

  case class Normalize(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "normalize_text"

    override def nullSafeEval(input: Any): Any =
      NormalizeText.normalize(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NormalizeText.normalize($c)")

    override protected def withNewChildInternal(
        newChild: org.apache.spark.sql.catalyst.expressions.Expression): Normalize =
      copy(child = newChild)
  }

  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.toLowerCase.getBytes
    val out = new Array[Byte](bytes.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val alnum = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (alnum) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        out(n) = b; n += 1
        pendingSpace = false
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }

  def normalize(c: Column): Column =
    GraftSqlBridge.column(Normalize(GraftSqlBridge.expression(c)))
}
