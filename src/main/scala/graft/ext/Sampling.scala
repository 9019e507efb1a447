package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus mixture sampling for training-data pipelines: draw a
  * DIFFERENT deterministic fraction of each source, so a dataset mix
  * ("75% of the curated sources, 25% of the crawl") is reproducible
  * across runs, machines, and engines.
  *
  * The sampling key is a cryptographic hash of the stable row id — not
  * `rand()` (not reproducible across partitionings) and not the raw id
  * (ids correlate with crawl order). A row is kept when the first hex
  * digit of md5(doc_id) falls below the source's threshold digit, giving
  * per-source rates in 1/16 steps that any engine with md5 reproduces
  * bit-for-bit (the DuckDB oracle runs the identical predicate).
  *
  * Scale: pure map-side filter — no shuffle, no state; composes with
  * any downstream pipeline. Per-row cost is one md5 of a short string.
  */
object Sampling {

  /** Keep-threshold hex digit per source: short source names ("src0"…)
    * sample at 12/16 = 75%, longer ones ("src10"…) at 4/16 = 25% — a
    * stand-in mixture policy; real pipelines pass a rate table. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val keyHex = substring(md5(col("doc_id").cast("string")), 1, 1)
    val thresholdHex =
      when(length(col("source")) <= 4, lit("c")).otherwise(lit("4"))
    Tables.load(spark, dir, "documents")
      .filter(keyHex < thresholdHex)
      .select(col("doc_id"), col("source"))
  }

  /** Per-source kept/total counts for the same mixture — the audit view
    * a pipeline logs next to the sampled corpus. */
  def mixtureRates(spark: SparkSession, dir: String): DataFrame = {
    val keyHex = substring(md5(col("doc_id").cast("string")), 1, 1)
    val thresholdHex =
      when(length(col("source")) <= 4, lit("c")).otherwise(lit("4"))
    Tables.load(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
           sum(when(keyHex < thresholdHex, 1L).otherwise(0L)).as("n_kept"))
  }
}
