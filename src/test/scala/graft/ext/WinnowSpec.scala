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

  test("property: every random doc pair sharing a >= w+k-1 run matches") {
    // ScalaCheck-style randomized check with a fixed seed: random word
    // sequences with a random shared run of length w+k-1..2(w+k) words
    // planted at random offsets MUST share a winnowed fingerprint
    // (Schleimer-Wilkerson-Aiken guarantee), for every case.
    val rnd = new scala.util.Random(4242)
    def words(n: Int): Seq[String] =
      Seq.fill(n)("w" + rnd.nextInt(1000000))
    val cases = (0 until 20).map { i =>
      val run = words(w + k - 1 + rnd.nextInt(w + k + 1))
      def doc(): String = {
        val pre = words(rnd.nextInt(30))
        val post = words(rnd.nextInt(30))
        (pre ++ run ++ post).mkString(" ")
      }
      (2L * i, doc(), 2L * i + 1, doc())
    }
    val docs = cases.flatMap { case (ida, ta, idb, tb) =>
      Seq((ida, ta), (idb, tb)) }
      .toDF("doc_id", "text")
    val sel = Winnow.selectedFingerprintsOf(docs, k, w).cache()
    val pairs = sel.as("a").join(sel.as("b"),
        col("a.sel") === col("b.sel") &&
        col("a.doc_id") + 1 === col("b.doc_id") &&
        col("a.doc_id") % 2 === 0)
      .select(col("a.doc_id")).distinct().count()
    assert(pairs == cases.length,
      s"all ${cases.length} planted pairs must match, got $pairs")
    sel.unpersist()
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
