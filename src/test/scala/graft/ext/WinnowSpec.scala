package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing (MOSS) fingerprints: selection bounds and the match
  * guarantee — shared runs of >= w + k - 1 words MUST share a selected
  * fingerprint (Schleimer-Wilkerson-Aiken theorem). */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val w = 4

  test("per-doc stats: selection is nonempty, bounded by gram count") {
    val fps = Winnow.fingerprints(spark, sfDir, k, w).cache()
    assert(fps.count() > 0)
    assert(fps.filter(col("n_fingerprints") < 1).count() == 0)
    // winnowing selects at most one fp per window start
    assert(fps.filter(col("n_fingerprints") > col("n_grams")).count() == 0)
    assert(fps.filter(col("min_fp") > col("max_fp")).count() == 0)
    fps.unpersist()
  }

  test("match guarantee: docs sharing a long run share a fingerprint") {
    // 12 shared words (> w + k - 1 = 6) embedded in different contexts
    val shared = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten eleven twelve"),
      (3L, "totally different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val sel = Winnow.selectedFingerprintsOf(docs, k, w).cache()
    val common12 = sel.filter(col("doc_id") === 1).select("sel")
      .intersect(sel.filter(col("doc_id") === 2).select("sel")).count()
    assert(common12 > 0, "shared 12-word run must share a fingerprint")
    val common13 = sel.filter(col("doc_id") === 1).select("sel")
      .intersect(sel.filter(col("doc_id") === 3).select("sel")).count()
    assert(common13 == 0, "disjoint vocabularies cannot share fingerprints")
    sel.unpersist()
  }

  test("cross-doc matches: symmetric-free, shared bounded by set sizes") {
    val m = Winnow.matches(spark, sfDir).cache()
    assert(m.count() > 0, "planted near-dups must share fingerprints")
    assert(m.filter(col("a_id") >= col("b_id")).count() == 0)
    // shared count cannot exceed either doc's fingerprint-set size
    val fps = Winnow.fingerprints(spark, sfDir)
      .select(col("doc_id"), col("n_fingerprints"))
    val bad = m
      .join(fps.withColumnRenamed("doc_id", "a_id")
               .withColumnRenamed("n_fingerprints", "na"), "a_id")
      .join(fps.withColumnRenamed("doc_id", "b_id")
               .withColumnRenamed("n_fingerprints", "nb"), "b_id")
      .filter(col("shared") > least(col("na"), col("nb")))
    assert(bad.count() == 0)
    m.unpersist()
  }

  test("fingerprints are a subset of the doc's gram hashes") {
    val docs = Seq((1L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")
    val sel = Winnow.selectedFingerprintsOf(docs, k, w)
      .select(col("sel").as("gh"))
    val grams = Winnow.gramHashesOf(docs, k).select("gh").distinct()
    assert(sel.exceptAll(grams).count() == 0)
  }
}
