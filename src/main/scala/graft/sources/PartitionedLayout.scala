package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout + partition-pruned scan — the other
  * half of the storage story next to [[Bucketing]]: data written
  * `partitionBy(day)` lets a day-ranged query read ONLY the matching
  * directories (partition pruning happens at planning, before any file
  * is opened). The gate rewrites events partitioned by day, runs a
  * 7-day rollup against the rewritten layout, and must hash-match the
  * oracle's filter over the raw table — certifying the layout loses
  * nothing AND the pruned scan selects exactly the right days.
  *
  * At 100 TB this is THE first-line scan reducer: time-ranged queries
  * touch days/years of the corpus; partition pruning turns them from
  * full scans into range-sized scans. PartitionedLayoutSpec asserts the
  * plan prunes (scan's partition count equals the selected days, and
  * the day filter appears as a PartitionFilter, not a data filter). */
object PartitionedLayout {

  /** Write events partitioned by day under a scratch base (idempotent
    * per dir); returns the base path. */
  private[sources] def writePartitioned(spark: SparkSession,
                                        dir: String): String = {
    val base = new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_part_layout_" + Integer.toHexString(dir.hashCode)).getPath
    graft.Tables.load(spark, dir, "events")
      .withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite).partitionBy("d").parquet(base)
    base
  }

  /** The pruned scan (exposed for the plan spec): a 7-day band filter
    * on the partition column of the rewritten layout. Day bounds come
    * from a driver-side 1-row min aggregate (bounded by construction)
    * so the filter is LITERAL — statically prunable at planning. */
  def prunedScan(spark: SparkSession, dir: String,
                 startOffsetDays: Int = 5, days: Int = 7): DataFrame = {
    val base = writePartitioned(spark, dir)
    val minDay = java.time.LocalDate.parse(
      graft.Tables.load(spark, dir, "events")
        .agg(date_format(min(col("ts")), "yyyy-MM-dd")).collect()(0)
        .getString(0))
    val lo = minDay.plusDays(startOffsetDays).toString
    val hi = minDay.plusDays(startOffsetDays + days - 1).toString
    spark.read.parquet(base).filter(col("d").between(lo, hi))
  }

  /** Gate: per-day-and-type rollup over the pruned scan. */
  def prunedScanGate(spark: SparkSession, dir: String): DataFrame =
    prunedScan(spark, dir)
      // partition-column type inference reads `d` back as DATE; format
      // at the output edge so the gate compares strings either way
      .groupBy(date_format(col("d"), "yyyy-MM-dd").as("d"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
             .as("sum_value"))

  def prunedScanGateOracleSql(startOffsetDays: Int = 5,
                              days: Int = 7): String =
    s"""WITH b AS (SELECT min(date_trunc('day', ts)) AS mn FROM events)
       |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
       |  event_type, count(*) AS n,
       |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
       |    AS sum_value
       |FROM events, b
       |WHERE date_trunc('day', ts) >= mn + INTERVAL $startOffsetDays DAY
       |  AND date_trunc('day', ts)
       |      <= mn + INTERVAL ${startOffsetDays + days - 1} DAY
       |GROUP BY 1, 2""".stripMargin
}
