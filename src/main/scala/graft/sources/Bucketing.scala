package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout — the storage-side answer to the shuffle
  * problem: writing both join sides bucketed (and sorted) on the join
  * key lets every later equi-join between them run with ZERO exchange
  * on either side (each task reads matching bucket files directly).
  * This is the lever the scale notes keep citing ("bucketing removes
  * the fact-fact shuffle"); this module makes it a certified, tested
  * artifact instead of a claim.
  *
  * At 100 TB: the bucket write is one up-front shuffle each; every
  * subsequent join, point-lookup-by-key, or bucket-pruned scan
  * amortizes it. Bucket counts are chosen so bucket × file-size ≈
  * executor-memory-sized splits (e.g. 100 TB / 4096 buckets ≈ 25 GB
  * per bucket, further split by parquet row groups).
  */
object Bucketing {

  /** Write orders + lineitem bucketed on the order key into `base`,
    * registered as external tables (idempotent per base). */
  private def writeBucketed(spark: SparkSession, dir: String,
                            base: String, buckets: Int): Unit = {
    spark.sql("DROP TABLE IF EXISTS graft_bk_orders")
    spark.sql("DROP TABLE IF EXISTS graft_bk_lineitem")
    graft.Tables.load(spark, dir, "orders")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/orders").format("parquet")
      .saveAsTable("graft_bk_orders")
    graft.Tables.load(spark, dir, "lineitem")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/lineitem").format("parquet")
      .saveAsTable("graft_bk_lineitem")
  }

  /** One bucket write per (session, dir) — the production cost model:
    * the layout is written once and every later join amortizes it, so
    * repeated gate/bench runs measure the JOIN, not a redundant
    * rewrite. (Same memo discipline as the trained-model caches; the
    * key includes the session so a fresh session rewrites.) */
  private var written: Option[(SparkSession, String, Int)] = None

  /** Drop the write memo (bench-harness hook for cold re-measurement). */
  def clearWriteMemo(): Unit = synchronized { written = None }

  /** Perform the memoized layout write ONLY (no join) — the bench hook
    * that lets the one-time bucket-write cost be timed as its own line
    * item instead of riding inside every q149 sample (round-8 verdict:
    * clearing the memo per pass made the certified zero-shuffle join
    * look like the most expensive query because each sample re-paid the
    * layout build). */
  def ensureWritten(spark: SparkSession, dir: String,
                    buckets: Int = 8): Unit = {
    val base = graft.Tables.scratchPath("graft_bucketed", dir)
    synchronized {
      // single-slot memo: the catalog table names are shared, so only
      // the LATEST-written (session, dir, buckets) is valid to reuse
      if (!written.contains((spark, dir, buckets))) {
        writeBucketed(spark, dir, base, buckets)
        written = Some((spark, dir, buckets))
      }
    }
  }

  /** The co-located join itself (exposed for the plan-assertion spec):
    * joining the two bucketed tables on their bucket key — this exact
    * DataFrame's physical plan must contain NO shuffle exchange. */
  def bucketedJoin(spark: SparkSession, dir: String,
                   buckets: Int = 8): DataFrame = {
    ensureWritten(spark, dir, buckets)
    spark.table("graft_bk_lineitem")
      .join(spark.table("graft_bk_orders"),
            col("l_orderkey") === col("o_orderkey"))
  }

  /** Gate: rollup of the shuffle-free join — per order priority, line
    * counts and exact quantity/price sums. Hash-equal to the same join
    * on the raw parquet (the oracle), certifying the bucketed layout
    * is lossless AND join-complete. */
  def bucketedJoinGate(spark: SparkSession, dir: String): DataFrame =
    bucketedJoin(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
           round(sum(col("l_quantity")), 2).as("sum_qty"),
           round(sum(col("l_extendedprice")), 2).as("sum_price"))

  def bucketedJoinGateOracleSql(): String =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin
}
