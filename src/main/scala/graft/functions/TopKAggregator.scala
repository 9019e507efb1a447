package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bounded top-k aggregator — the typed
  * `org.apache.spark.sql.expressions.Aggregator` surface
  * (`Dataset.groupByKey(...).agg(topK.toColumn)`), doing per-group
  * top-k the way a cluster should: every partition reduces its rows
  * into a k-BOUNDED buffer map-side, and only those ≤k-element buffers
  * shuffle and merge. The window formulation
  * (`row_number() OVER (... ORDER BY n DESC) <= k`) shuffles and sorts
  * EVERY row of every group first — at 100 TB the difference is the
  * whole group's data volume vs k rows per partition.
  *
  * Deterministic total order: (count desc, value asc) — the repo's
  * standard tie-break — applied identically in reduce, merge, and
  * finish, so the result is independent of partitioning and row order
  * (spec-asserted against the window formulation).
  *
  * The buffer is a plain sorted `Seq` capped at k (k is small by
  * definition here); product encoders keep it in Tungsten rows — no
  * kryo blobs. */
class TopKByCount(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)],
                       Seq[(String, Long)]] {
  require(k > 0, "k must be positive")

  private def order(t: (String, Long)): (Long, String) = (-t._2, t._1)

  override def zero: Seq[(String, Long)] = Nil

  override def reduce(buf: Seq[(String, Long)],
                      row: (String, Long)): Seq[(String, Long)] =
    merge(buf, Seq(row))

  override def merge(a: Seq[(String, Long)],
                     b: Seq[(String, Long)]): Seq[(String, Long)] =
    (a ++ b).sortBy(order).take(k)

  override def finish(r: Seq[(String, Long)]): Seq[(String, Long)] =
    r.sortBy(order)

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] = bufferEncoder
}
