package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftSqlBridge

/** Codegen'd vector kernels over `array<float>` / `array<double>` columns.
  *
  * Value-identical to the higher-order-function formulations they replace
  * (`aggregate(zip_with(a, b, (u,v) -> u*v), 0.0, (acc,v) -> acc+v)` etc.:
  * same sequential left-to-right double accumulation, same null semantics —
  * any null element nulls the result), but evaluated as one tight JVM loop
  * per call instead of an interpreted lambda walk per element. On a
  * candidate-pair join evaluating millions of 64-dim dot products the HOF
  * path is the dominant stage cost; these run inside whole-stage codegen.
  */
object VectorOps {

  private def isFloatArray(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Sequential double dot product; null if any touched element is null.
    * Lengths may differ: only the common prefix is accumulated (zip_with
    * would null-pad and thus null the result — our inputs are fixed-dim,
    * so the distinction is unobservable; documented for completeness). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "vec_dot"

    private lazy val lf = isFloatArray(left)
    private lazy val rf = isFloatArray(right)

    override def nullSafeEval(a: Any, b: Any): Any =
      VectorOps.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        java.lang.Double ${ev.value}_r =
          graft.functions.VectorOps.dotOrNull($a, $b, $lf, $rf);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.doubleValue(); }
      """)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** L2-normalized double copy of a vector; null if any element is null. */
  case class L2Normalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "vec_l2norm"

    private lazy val cf = isFloatArray(child)

    override def nullSafeEval(input: Any): Any =
      VectorOps.l2OrNull(input.asInstanceOf[ArrayData], cf)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
          graft.functions.VectorOps.l2OrNull($c, $cf);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r; }
      """)

    override protected def withNewChildInternal(newChild: Expression): L2Normalize =
      copy(child = newChild)
  }

  /** PQ distance table for ONE subspace: the K squared distances from
    * `child`'s elements [start, start+sub) to a literal K×sub codebook,
    * as one compiled loop. Value-identical to the
    * `array(aggregate(zip_with(slice(emb, start+1, sub), lit(c_k),
    * (x,c) -> (x-c)*(x-c)), 0.0, (acc,d) -> acc+d) for k)` tree it
    * replaces — same element casts, same left-to-right accumulation
    * order, same null semantics (a null or absent element inside the
    * subspace range nulls every entry, exactly as zip_with's null
    * padding poisons the fold; a null vector yields the same K-null
    * array the old CreateArray of null folds produced). The HOF tree
    * is CodegenFallback — interpreted per (row × k × element) — and
    * was the dominant cost of the corpus-sized PQ encode. */
  case class PqSubspaceDists(child: Expression, cents: Array[Array[Double]],
                             start: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def nullable: Boolean = false
    override def prettyName: String = "pq_subspace_dists"

    private lazy val cf = isFloatArray(child)

    override def eval(
        input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      VectorOps.pqDistsOrNulls(
        if (v == null) null else v.asInstanceOf[ArrayData], cents, start, cf)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][]")
      val childGen = child.genCode(ctx)
      ev.copy(code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.VectorOps.pqDistsOrNulls(
            ${childGen.isNull} ? null : ${childGen.value},
            $centsRef, $start, $cf);
      """, isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(
        newChild: Expression): PqSubspaceDists = copy(child = newChild)
  }

  /** Shared by interpreted eval and generated code: K squared distances
    * or K nulls (null/short/null-element input — the zip_with-padding
    * semantics, see [[PqSubspaceDists]]). */
  def pqDistsOrNulls(a: ArrayData, cents: Array[Array[Double]],
                     start: Int, aFloat: Boolean): ArrayData = {
    val k = cents.length
    val sub = cents(0).length
    var ok = a != null && a.numElements() >= start + sub
    if (ok) {
      var j = 0
      while (j < sub) {
        if (a.isNullAt(start + j)) { ok = false; j = sub } else j += 1
      }
    }
    if (!ok) return new GenericArrayData(new Array[Any](k))
    val x = new Array[Double](sub)
    var j = 0
    while (j < sub) {
      x(j) = if (aFloat) a.getFloat(start + j).toDouble
             else a.getDouble(start + j)
      j += 1
    }
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cc = cents(c)
      var acc = 0.0
      var i = 0
      while (i < sub) { val t = x(i) - cc(i); acc += t * t; i += 1 }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  def pqSubspaceDists(emb: Column, cents: Array[Array[Double]],
                      start: Int): Column =
    GraftSqlBridge.column(PqSubspaceDists(
      GraftSqlBridge.expression(emb), cents, start))

  /** Shared by interpreted eval and generated code. */
  def dotOrNull(a: ArrayData, b: ArrayData,
                aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Shared by interpreted eval and generated code. */
  def l2OrNull(a: ArrayData, aFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var sumsq = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x
      sumsq += x * x
      i += 1
    }
    val norm = math.sqrt(sumsq)
    i = 0
    while (i < n) { out(i) = out(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def l2normalize(a: Column): Column =
    GraftSqlBridge.column(L2Normalize(GraftSqlBridge.expression(a)))
}
