package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries of a string — the rolling-hash cut
  * rule behind rsync/LBFS/FastCDC dedup: position `i` (1-based, `i >= w`)
  * is a boundary when the polynomial hash of the `w`-byte window ending
  * at `i` satisfies `h % divisor == 0`. Because the rule looks only at
  * local content, an insertion early in a document shifts every
  * FIXED-size chunk but leaves all content-defined chunks after the edit
  * point identical — which is why chunk-level dedup catches
  * near-duplicate documents that whole-document hashing misses.
  *
  * `h` is the fold `h = (h * b + byte) mod m` over the window (the
  * Karp–Rabin polynomial hash), evaluated here as a TRUE rolling update:
  * O(1) per position via the precomputed `b^(w-1) mod m` removal factor,
  * one pass per row inside whole-stage codegen. Integer math end to end,
  * so an external SQL engine replays boundaries exactly with a per-window
  * fold (algebraically identical to the rolling form).
  *
  * Simplification vs FastCDC (documented): no min/max chunk-size
  * clamping — the pure cut rule keeps every position's decision
  * stateless, which is what makes the cross-engine replay exact.
  *
  * Intended for the engine's NORMALIZED text (ASCII lowercase
  * alphanumerics + spaces, see [[NormalizeText]]); bytes are hashed
  * as unsigned, so any UTF-8 input is still deterministic. */
case class CdcBoundaries(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression {
  require(w >= 2, "window width must be >= 2")
  require(divisor >= 2, "divisor must be >= 2")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.compute(input.asInstanceOf[UTF8String], w, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcBoundaries.compute($c, $w, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  /** Hash base/modulus: small enough that `m * b` stays inside a signed
    * 64-bit long, large enough that `% divisor` is unbiased in practice. */
  val Base = 31L
  val Mod = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, w: Int, divisor: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < w) return new GenericArrayData(Array.emptyIntArray)
    // b^(w-1) mod m — the multiplier of the byte leaving the window
    var pow = 1L
    var j = 1
    while (j < w) { pow = pow * Base % Mod; j += 1 }
    val out = new java.util.ArrayList[Integer]()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      if (i >= w) {
        // remove the byte that slid out of the w-window (its coefficient
        // is now b^w; it was multiplied by Base once more than pow)
        val outByte = (bytes(i - w) & 0xff).toLong
        h = (h - outByte * pow % Mod * Base % Mod + Mod * Base) % Mod
      }
      if (i >= w - 1 && h % divisor == 0) out.add(i + 1) // 1-based end
      i += 1
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  /** Column builder: 1-based boundary end-positions of `text`. */
  def cdcBoundaries(text: Column, w: Int, divisor: Int): Column =
    GraftSqlBridge.column(
      CdcBoundaries(GraftSqlBridge.expression(text), w, divisor))
}
