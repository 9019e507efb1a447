package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.GraftSqlBridge

/** MinHash signature of a shingle-hash set, computed per ROW:
  * `sig_i = min over shingles h of ((a_i * pmod(h, P) + b_i) mod P)`.
  *
  * This replaces the explode → 32-way min-aggregate formulation: same
  * numbers, but as a map-side expression there is NO shuffle and NO
  * row explosion — at 100 TB the signature stage goes from "shuffle
  * |docs| x |shingles| rows" to a pure scan. One tight loop per row
  * inside whole-stage codegen.
  *
  * Permutation coefficients are fixed at construction (signatures must
  * be stable across runs and executors).
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty, "need matching a/b coefficients")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], a.toArray, b.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // embed the coefficient arrays once as class members, not per-row
    val aRef = ctx.addReferenceObj("mhA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b.toArray, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.compute($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P = 2147483647L // 2^31 - 1, Mersenne prime

  /** Shared by interpreted eval and generated code. */
  def compute(shingles: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val raw = shingles.getLong(i)
        val h = { val m = raw % P; if (m < 0) m + P else m } // pmod
        var j = 0
        while (j < k) {
          val v = (a(j) * h + b(j)) % P // a,h,b < 2^31: no 64-bit overflow
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def minhashSig(shingles: Column, a: Seq[Long], b: Seq[Long]): Column =
    GraftSqlBridge.column(
      MinHashSig(GraftSqlBridge.expression(shingles), a, b))
}
