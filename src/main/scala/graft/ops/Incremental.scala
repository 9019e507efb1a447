package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental materialized-view maintenance — the batch half of the
  * Lambda pattern: a standing aggregate (the "view") is kept current by
  * folding in each new micro-batch's PARTIAL aggregate instead of
  * recomputing over history. Sum/count views are self-mergeable
  * (commutative monoids), so `merge(agg(old), agg(delta)) ≡ agg(all)`
  * — the identity this module certifies.
  *
  * The gate splits events deterministically into a "standing" set and a
  * "newly-arrived" delta (event_id mod 10), aggregates each separately,
  * merges via a full-outer key join with coalesced partials, and the
  * ORACLE aggregates the full table directly — so the hash compare
  * proves incremental maintenance is exact, across engines. Sums
  * accumulate in DECIMAL (the exact 2-decimal money domain) so partial
  * + partial equals total bit-for-bit.
  *
  * Scale: this is THE pattern at 100 TB — the delta is hours of data,
  * the view is bounded (hours × types); recompute-from-history is a
  * full corpus scan, the merge is a broadcast-sized join. */
object Incremental {

  private[graft] def hourlyPartial(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("h"),
                   col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).as("sv"))

  /** Merge two partial hourly views (full-outer on the group keys,
    * coalesced monoid adds). */
  def mergeHourly(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.select(col("h").as("h2"), col("event_type").as("et2"),
                      col("n").as("n2"), col("sv").as("sv2"))
    a.join(bb, col("h") === col("h2") && col("event_type") === col("et2"),
           "full_outer")
      .select(
        coalesce(col("h"), col("h2")).as("h"),
        coalesce(col("event_type"), col("et2")).as("event_type"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("n2"), lit(0L)))
          .as("n"),
        (coalesce(col("sv"), lit(0).cast("decimal(18,2)")) +
         coalesce(col("sv2"), lit(0).cast("decimal(18,2)"))).as("sv"))
  }

  /** Gate: maintain the hourly view incrementally (standing ∪ delta)
    * and emit it; the oracle recomputes from the full table. */
  def incrementalHourlyGate(spark: SparkSession, dir: String,
                            mod: Int = 10): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val standing = ev.filter(col("event_id") % mod =!= 0)
    val delta = ev.filter(col("event_id") % mod === 0)
    mergeHourly(hourlyPartial(standing), hourlyPartial(delta))
      .select(col("h"), col("event_type"), col("n"),
              round(col("sv").cast("double"), 2).as("sum_value"))
  }

  def incrementalHourlyGateOracleSql(): String =
    """SELECT date_trunc('hour', ts) AS h, event_type,
      |  count(*) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
      |    AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin
}
