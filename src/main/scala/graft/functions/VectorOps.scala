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
