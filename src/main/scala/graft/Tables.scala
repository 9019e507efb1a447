package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loader for the driver-generated parquet tables
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Design notes for scale (the 100 TB rule):
  *   - Tables are plain `spark.read.parquet` DataFrames — Catalyst keeps the
  *     scan declarative so filter pushdown / column pruning / partition
  *     pruning all apply. No driver-side materialization ever happens here.
  *   - `dim()` marks genuinely-small dimension tables (region, nation,
  *     supplier at any scale factor; these are bounded by real-world
  *     cardinality, not data volume) with a broadcast hint so joins against
  *     them never shuffle the fact side.
  */
object Tables {
  /** All driver tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Tables whose cardinality is bounded in the real world (TPC-H dims):
    * always safe to broadcast regardless of scale factor. */
  private val boundedDims = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read nanos as long (legacy conf) and
    * truncate to microseconds — the same ns→µs truncation DuckDB applies,
    * so oracle comparisons agree. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    // timestamp_micros yields TIMESTAMP_LTZ; cast to NTZ under the UTC
    // session so written outputs compare naive-to-naive with DuckDB.
    df.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000"))
        .cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** A dimension table with a broadcast hint when it is bounded-small. */
  def dim(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    if (boundedDims(name)) org.apache.spark.sql.functions.broadcast(df) else df
  }

  /** Register every table as a temp view (for spark.sql-based queries).
    * View names match the DuckDB oracle's table names. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
