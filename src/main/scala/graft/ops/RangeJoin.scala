package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Banded range join — an equi-join plan for a pure range predicate.
  *
  * `a ⋈ b ON |a.t − b.t| ≤ w` has no equi key, so Catalyst plans a
  * broadcast-nested-loop (or cartesian) join: O(|a|·|b|) comparisons and
  * a broadcast of a whole side. The banded form buckets both sides by
  * `floor(t / w)`: any pair within `w` differs by at most one bucket, so
  * replicating ONE side into its 3 adjacent buckets (fixed 3× fan-out)
  * and equi-joining on the bucket id meets every qualifying pair exactly
  * once — each pair meets only where the replicated row's bucket equals
  * the probe row's single bucket. A residual `|Δt| ≤ w` filter inside
  * the join keeps exactness; the plan becomes a shuffled hash/sort-merge
  * join keyed on the bucket, which scales linearly and AQE-splits hot
  * buckets. Same decomposition as Spark's `RangeJoin` hints in other
  * engines (DBR, Sedona) — here as a plain composable operator.
  */
object RangeJoin {

  /** For every `probe`-side event, aggregate `build`-side events whose
    * `ts` lies within ±`windowSec`: emits one row per probe row with
    * n_nearby / sum of `valueCol` (left-join semantics — probe rows with
    * no neighbor keep n_nearby = 0, sum = null). */
  /** Epoch seconds as double (ts is TIMESTAMP_NTZ; hop through LTZ
    * under the UTC session — same idiom as ext.Events.sessionize). */
  private def epochSec(c: org.apache.spark.sql.Column) =
    c.cast("timestamp").cast("double")

  def nearbyAgg(probe: DataFrame, build: DataFrame,
                windowSec: Long, valueCol: String): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    def bucket(c: org.apache.spark.sql.Column) =
      floor(epochSec(c) / windowSec).cast("long")
    val p = probe.withColumn("__b", bucket(col("ts")))
    val b = build
      .select(col("ts").as("__bts"), col(valueCol).as("__bv"))
      .withColumn("__b", explode(array(
        bucket(col("__bts")) - 1,
        bucket(col("__bts")),
        bucket(col("__bts")) + 1)))
    val joined = p.join(b,
      p("__b") === b("__b") &&
        abs(epochSec(col("__bts")) - epochSec(col("ts"))) <= windowSec,
      "left_outer")
    joined
      .groupBy(col("event_id"))
      .agg(count(col("__bts")).as("n_nearby"),
           round(sum(col("__bv")), 2).as("sum_nearby_value"))
  }

  /** Gate: for each error event, the click events (any user) within
    * ±5 minutes — neighborhood context assembly around anomalies. */
  def errorsNearClicks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    nearbyAgg(
      ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts")),
      ev.filter(col("event_type") === "click")
        .select(col("ts"), col("value")),
      windowSec = 300L, valueCol = "value")
  }

  val errorsNearClicksOracleSql: String =
    """SELECT e.event_id AS event_id,
      |  CAST(count(c.ts) AS BIGINT) AS n_nearby,
      |  round(sum(c.value), 2) AS sum_nearby_value
      |FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
      |LEFT JOIN (SELECT ts, value FROM events
      |           WHERE event_type = 'click') c
      |  ON abs(epoch(c.ts) - epoch(e.ts)) <= 300.0
      |GROUP BY e.event_id""".stripMargin
}
