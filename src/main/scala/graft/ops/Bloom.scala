package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.BloomMightContainLong

/** Bloom-filter join pruning — cut the big side's shuffle volume before
  * an equi-join whose small side is too large to broadcast exactly but
  * whose KEY SET sketches into a few megabytes.
  *
  * A broadcast hash join needs the whole small side in every executor; a
  * plain sort-merge join shuffles every big-side row, matched or not.
  * The middle ground: build a Bloom filter over the small side's keys
  * (one pass, driver holds only the fixed-size bitmap), probe it
  * map-side on the big side (codegen'd, see
  * [[graft.functions.BloomMightContainLong]]), and only then shuffle for
  * the exact join. False positives cost nothing but a wasted shuffled
  * row — the join that follows is exact — and false negatives cannot
  * occur, so the result is bit-identical to the unpruned join (spec- and
  * oracle-asserted).
  *
  * At 100 TB this is the difference between shuffling the full fact
  * table and shuffling only the ~matching fraction; Spark's own AQE
  * runtime filtering makes the same trade implicitly, this operator
  * makes it explicit and tunable (`expectedItems`/`fpp` size the bitmap:
  * ~1.2 GB per 10^9 keys at 1% fpp, still broadcast-friendly).
  */
object Bloom {

  /** `large ⋈ small ON largeKey = smallKey`, with `large` pre-pruned by
    * a Bloom filter built over `small[smallKey]`. Keys must be integral
    * (probed as long). Inner/semi joins only: under left/outer/anti
    * joins the prune would change which preserved rows survive (a
    * pruned row is exactly what an outer join pads and an anti join
    * emits), so pruning is only sound where dropped-if-unmatched holds. */
  def prunedJoin(large: DataFrame, largeKey: String,
                 small: DataFrame, smallKey: String,
                 expectedItems: Long, fpp: Double = 0.03,
                 joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi")
              .contains(joinType.toLowerCase.replace(" ", "")),
      s"prunedJoin supports inner/left_semi joins only, got '$joinType'")
    val filter = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    large.filter(BloomMightContainLong.mightContain(col(largeKey), filter))
      .join(small, col(largeKey) === col(smallKey), joinType)
  }
}
