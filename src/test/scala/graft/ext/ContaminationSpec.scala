package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Decontamination + repetition quality signals. */
class ContaminationSpec extends SparkSpec {

  test("contaminated docs are never benchmark docs and share real grams") {
    val out = Contamination.contaminated(spark, sfDir, n = 4).cache()
    assert(out.count() > 0)
    // no benchmark doc flags itself
    assert(out.filter(pmod(col("doc_id"), lit(20)) === 0).count() == 0)
    assert(out.filter(col("n_shared_grams") <= 0).count() == 0)
    out.unpersist()
  }

  test("a doc sharing a 4-gram with the benchmark slice is flagged") {
    // hand-check one flagged doc: its normalized text must contain a
    // 4-gram that also appears in some benchmark (doc_id % 20 == 0) doc
    val flagged = Contamination.contaminated(spark, sfDir, n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        split(TextAnalysis.normalized(col("text")), " ").as("ts"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    def grams(ts: Seq[String]) =
      if (ts.length < 4) Set.empty[String]
      else ts.sliding(4).map(_.mkString(" ")).toSet
    val benchGrams = docs.filter(_._1 % 20 == 0).flatMap(g => grams(g._2)).toSet
    val expected = docs.filter(_._1 % 20 != 0)
      .filter(d => grams(d._2).exists(benchGrams.contains))
      .map(_._1).toSet
    assert(flagged == expected)
  }

  test("contamination joins broadcast — the corpus is never shuffled for it") {
    val plan = Contamination.contaminated(spark, sfDir, n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join against the benchmark gram set:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "corpus-side shuffle join found")
  }

  test("repetition stats: identities hold row by row") {
    val out = TextAnalysis.repetitionStats(spark, sfDir).cache()
    assert(out.count() > 0)
    val bad = out.filter(
      col("max_tf") > col("n_tokens") ||
      col("n_distinct") > col("n_tokens") ||
      col("top_share") =!= col("max_tf").cast("double") / col("n_tokens") ||
      col("distinct_ratio") =!=
        col("n_distinct").cast("double") / col("n_tokens")).count()
    assert(bad == 0)
    out.unpersist()
  }
}
