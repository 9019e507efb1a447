package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter
import org.apache.spark.sql.GraftSqlBridge

/** `bloom.mightContainLong(child)` against a pre-built [[BloomFilter]],
  * carried in the expression tree as its serialized bytes.
  *
  * The filter is deserialized once per executor plan instance (lazy
  * transient) and referenced from generated code via `addReferenceObj`,
  * so the per-row probe stays inside whole-stage codegen — no UDF
  * boxing, no per-row deserialization. This mirrors how Spark's own
  * runtime row-level filtering injects `BloomFilterMightContain`, but as
  * a public, explicitly-placed operator (see `graft.ops.Bloom`).
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomMightContainLong {
  def mightContain(c: Column, filter: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    GraftSqlBridge.column(BloomMightContainLong(
      GraftSqlBridge.expression(c.cast("long")), bos.toByteArray))
  }
}
