package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Benchmark decontamination — the training-data hygiene step that
  * removes eval-set leakage before training: a training document is
  * contaminated if it shares any word n-gram with a benchmark document.
  *
  * The demo benchmark set is the deterministic `doc_id % 20 == 0` slice
  * of `documents` (stand-in for a real eval suite), which keeps the
  * whole operator oracle-checkable in SQL.
  *
  * Scale design: the benchmark side is an eval suite — thousands of
  * documents, not billions — so its distinct n-gram set is broadcast
  * and the contamination check is a map-side semi-join against the
  * (huge) training corpus: no shuffle of the corpus at all. The
  * per-doc distinct-gram aggregation shuffles only the matched grams
  * (contamination is rare by construction). N-grams stay as strings
  * (not hashes) so the oracle can rebuild them verbatim.
  */
object Contamination {

  /** doc_id + exploded word `n`-gram strings for docs with >= n tokens
    * (shorter docs have no n-grams; both engines drop them). */
  private def grams(spark: SparkSession, dir: String, n: Int): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
              split(TextAnalysis.normalized(col("text")), " ").as("ts"))
      .filter(size(col("ts")) >= n)
      // codegen'd kernel — the equivalent transform/slice/concat_ws HOF
      // is evaluated interpreted per array element (StringNGramsSpec
      // asserts value parity with that formulation)
      .select(col("doc_id"),
        explode(graft.functions.StringNGrams.ngrams(col("ts"), n)).as("gram"))

  /** Contaminated training docs: every doc outside the benchmark slice
    * that shares at least one word-`n`-gram with it, with the count of
    * distinct shared grams. */
  def contaminated(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val g = grams(spark, dir, n)
    val bench = g.filter(pmod(col("doc_id"), lit(20)) === 0)
      .select(col("gram")).distinct()
    val train = g.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    // broadcast-join FIRST (map-side semi-filter of the huge corpus),
    // dedup per doc only the matched grams — the corpus itself is never
    // shuffled, only the (rare) contaminated gram hits are
    train.join(broadcast(bench), "gram")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_shared_grams"))
  }
}
