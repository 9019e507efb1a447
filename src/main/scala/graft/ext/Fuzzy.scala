package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Blocked fuzzy matching (entity resolution) — find name variants that
  * refer to the same entity via edit distance, the record-linkage
  * staple (product/merchant name-space dedup).
  *
  * Scale discipline: the match runs on the DISTINCT NAME SPACE, not the
  * row space — one shuffle folds the corpus to (name, n_rows) (names
  * obey a vocabulary law: ≪ rows at any corpus size), and the pairwise
  * edit-distance work is confined to blocking buckets within that
  * bounded table. Blocking here is the last name token (the head noun);
  * production adds a length band — |len(a) − len(b)| > maxDist can
  * never match, so the residual filter stays but the bucket shrinks.
  * All-pairs never happens: un-blocked names never meet.
  */
object Fuzzy {

  /** Gate: part-name variants within the same head-noun block at edit
    * distance ≤ `maxDist`. Output (name_a < name_b, dist, row counts of
    * each variant). */
  def fuzzyNameMatch(spark: SparkSession, dir: String,
                     maxDist: Int = 4): DataFrame = {
    val names = Tables.load(spark, dir, "part")
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
    val a = names.select(col("name").as("name_a"), col("n_rows").as("n_a"),
                         col("block"))
    val b = names.select(col("name").as("name_b"), col("n_rows").as("n_b"),
                         col("block").as("block_b"))
    a.join(b, col("block") === col("block_b") &&
              col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist").cast("long")
                .as("dist"), col("n_a"), col("n_b"))
  }

  /** Fuzzy point lookup THROUGH the optimizer rule — "names similar to
    * a query string": a plain bounded-levenshtein Filter that
    * [[graft.plans.EditDistanceBandRule]] (registered on the session's
    * `experimental.extraOptimizations`) rewrites to carry the free
    * length-band prefilter. The gate certifies the rule is semantically
    * transparent (the oracle runs the un-banded filter); FuzzySpec
    * asserts the band actually lands in the optimized plan. */
  def fuzzyLookup(spark: SparkSession, dir: String,
                  query: String = "red widget",
                  maxDist: Int = 4): DataFrame = {
    if (!spark.experimental.extraOptimizations
          .contains(graft.plans.EditDistanceBandRule))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.EditDistanceBandRule)
    Tables.load(spark, dir, "part")
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(levenshtein(col("name"), lit(query)) <= maxDist)
      .select(col("name"),
              levenshtein(col("name"), lit(query)).cast("long").as("dist"),
              col("n_rows"))
  }

  def fuzzyLookupOracleSql(query: String = "red widget",
                           maxDist: Int = 4): String =
    s"""SELECT p_name AS name,
       |  CAST(levenshtein(p_name, '$query') AS BIGINT) AS dist,
       |  count(*) AS n_rows
       |FROM part
       |GROUP BY p_name
       |HAVING levenshtein(p_name, '$query') <= $maxDist""".stripMargin

  def fuzzyNameMatchOracleSql(maxDist: Int = 4): String =
    s"""WITH names AS (
       |  SELECT p_name AS name, count(*) AS n_rows,
       |    string_split(p_name, ' ')[-1] AS block
       |  FROM part GROUP BY p_name)
       |SELECT a.name AS name_a, b.name AS name_b,
       |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
       |  a.n_rows AS n_a, b.n_rows AS n_b
       |FROM names a JOIN names b
       |  ON a.block = b.block AND a.name < b.name
       |WHERE levenshtein(a.name, b.name) <= $maxDist""".stripMargin
}
