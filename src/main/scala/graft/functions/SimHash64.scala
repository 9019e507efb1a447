package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftSqlBridge

/** SimHash over an array of 64-bit token hashes: each hash votes ±1 per
  * bit position; the fingerprint sets the bits with positive vote sums.
  * Near-duplicate texts (mostly-shared token multisets) land within a few
  * bits of Hamming distance.
  *
  * A native Catalyst `Expression` (not a UDF) with `doGenCode`, so it
  * stays inside whole-stage codegen: one pass over the token-hash array,
  * a 64-int vote buffer, zero allocation beyond that buffer per row.
  * Compose as: simhash64(transform(tokens, t -> xxhash64(t))).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Column builder: simhash of an array<long> of token hashes. */
  def simhash64(tokenHashes: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokenHashes)))
}
