package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for every left row, the most recent right row (by event
  * time) with the same key and time ≤ the left row's time — the
  * operator behind point-in-time feature lookups and "state as of the
  * event" enrichment, which Spark has no built-in for.
  *
  * Spark-first design: NO join at all. Both sides are unioned with a
  * side marker, shuffled ONCE on the key, sorted by (time, side,
  * tiebreak) within partitions, and each left row reads the running
  * `last(right value, ignoreNulls)` over the unbounded-preceding
  * window. Right rows at the same timestamp sort before left rows, so
  * `time ≤ left.time` is inclusive; the tiebreak column makes equal-
  * timestamp choices deterministic. Cost at any scale: one shuffle of
  * |L| + |R| rows on the key — never a per-pair blowup, no range-join
  * explosion, skew handled by AQE like any keyed sort. */
object AsOf {

  /** Generic form: `left` and `right` must share `key`, `time`, and
    * `tiebreak` column names; every column of `right` in `valueCols`
    * rides along as `asof_<name>` on the matched left rows (NULL when
    * no right row precedes). Equi-join NULL semantics: a NULL key never
    * matches — right rows with a NULL key are dropped, left rows with a
    * NULL key come through with NULL asof values (the window would
    * otherwise group all NULL keys together and "match" them). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               time: String, tiebreak: String,
               valueCols: Seq[String]): DataFrame = {
    val l2 = left.withColumn("__side", lit(1))
    val r2 = right.filter(col(key).isNotNull).select(
      (Seq(col(key), col(time), col(tiebreak), lit(0).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c"))): _*)
    // unionByName null-fills each side's missing columns: the left rows
    // carry null __v_* (filled by the window), the right rows carry null
    // left payload (dropped by the side filter)
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withVals = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true)
        .over(w))
    }
    withVals.filter(col("__side") === 1)
      .drop((("__side" +: valueCols.map(c => s"__v_$c")).toIndexedSeq): _*)
  }

  /** Tolerance (staleness-bounded) as-of join — the feature-store
    * variant: a match older than `toleranceSec` is as useless as no
    * match (a "last click" from last month must not enrich today's
    * purchase), so the matched value is nulled when the as-of row is
    * staler than the bound. Same single-shuffle union-window plan as
    * [[asofJoin]] with one extra ride-along column (the as-of TIME);
    * the staleness test is exact integer microsecond arithmetic. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        time: String, tiebreak: String,
                        valueCols: Seq[String],
                        toleranceSec: Long): DataFrame = {
    val rWithT = right.withColumn("__rt", col(time))
    val joined = asofJoin(left, rWithT, key, time, tiebreak,
                          valueCols :+ "__rt")
    val fresh = unix_micros(col(time).cast("timestamp")) -
      unix_micros(col("asof___rt").cast("timestamp")) <=
      lit(toleranceSec * 1000000L)
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c",
        when(col("asof___rt").isNotNull && fresh, col(s"asof_$c")))
    }.drop("asof___rt")
  }

  /** Gate shape: every purchase event annotated with the same user's
    * most recent click event id at or before the purchase time. */
  def purchasesWithLastClick(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.load(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    asofJoin(purchases, clicks, "user_id", "ts", "event_id",
             Seq("event_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("asof_event_id").as("last_click_id"))
  }

  /** Tolerance gate shape: the q47 enrichment with a 1-hour staleness
    * bound — clicks older than an hour before the purchase no longer
    * match (NULL instead). */
  def purchasesWithRecentClick(spark: SparkSession, dir: String,
                               toleranceSec: Long = 3600L): DataFrame = {
    val events = graft.Tables.load(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    asofJoinTolerance(purchases, clicks, "user_id", "ts", "event_id",
                      Seq("event_id"), toleranceSec)
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("asof_event_id").as("recent_click_id"))
  }

  /** CROSS-TABLE as-of enrichment — every event tagged with the same
    * customer's most recent ORDER at event time ("state as of the
    * event", the feature-store join across two different fact tables,
    * vs q47's within-events form). Same single union-window shuffle:
    * both sides rename onto the shared (key, time, tiebreak) triple;
    * equal timestamps match (inclusive), ties break to the highest
    * order key. The gate folds to per-type counts + an order-key
    * checksum so WHICH order matched is certified row-by-row without
    * emitting the corpus. */
  def eventsWithLastOrder(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").as("uid"), col("ts").as("t"),
              col("event_id").as("tb"), col("event_type"))
    val orders = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("uid"), col("o_orderdate").as("t"),
              col("o_orderkey").as("tb"), col("o_orderkey"))
    asofJoin(events, orders, "uid", "t", "tb", Seq("o_orderkey"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           count(col("asof_o_orderkey")).as("n_with_prior_order"),
           coalesce(sum(col("asof_o_orderkey") % 9973), lit(0L))
             .as("order_checksum"))
  }

  def eventsWithLastOrderOracleSql(): String =
    """SELECT e.event_type, count(*) AS n_events,
      |  count(o.k) AS n_with_prior_order,
      |  CAST(coalesce(sum(o.k % 9973), 0) AS BIGINT) AS order_checksum
      |FROM events e LEFT JOIN LATERAL (
      |  SELECT o_orderkey AS k FROM orders
      |  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
      |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON true
      |GROUP BY e.event_type""".stripMargin
}
