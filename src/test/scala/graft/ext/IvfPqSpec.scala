package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ ADC search (q107) + exact re-ranking (q108): determinism,
  * ranking contract, the quality ladder (rerank recovers most of what
  * 16-bit codes lose), and the scale-shape plan assertions. */
class IvfPqSpec extends SparkSpec {

  private def exactL2TopK(k: Int): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d").asc, col("nid"))
    emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
      .crossJoin(broadcast(q)).filter(col("qid") =!= col("nid"))
      .withColumn("d", aggregate(
        zip_with(col("qe"), col("ne"), (x, y) =>
          (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, t) => acc + t))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("nid"))
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallVsExact(df: DataFrame): Double = {
    val exact = pairs(exactL2TopK(10))
    pairs(df).intersect(exact).size.toDouble / exact.size
  }

  test("ADC output contract: k rows per query, rank follows adc_d, deterministic") {
    val a = Similarity.ivfPqTopK(spark, sfDir)
    val rows = a.collect()
    assert(rows.length == 50)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(2))
      assert(byRank.map(_.getLong(2)).toSeq == (1L to 10L))
      val ds = byRank.map(_.getDouble(3))
      assert(ds.zip(ds.tail).forall { case (x, y) => x <= y },
        "adc_d must be nondecreasing in rank")
    }
    assert(pairs(Similarity.ivfPqTopK(spark, sfDir)) == pairs(a))
  }

  test("quality ladder: rerank recovers what 16-bit ADC codes lose") {
    val adcRecall = recallVsExact(Similarity.ivfPqTopK(spark, sfDir))
    val rrRecall = recallVsExact(Similarity.ivfPqRerankTopK(spark, sfDir))
    // measured on the synthetic near-random corpus: ADC ~0.36 (m=4,k=16
    // is 16 bits/vector), rerank bounded only by IVF candidate recall
    assert(adcRecall >= 0.2, s"ADC recall degenerated: $adcRecall")
    assert(rrRecall >= 0.6, s"rerank recall too low: $rrRecall")
    assert(rrRecall >= adcRecall,
      s"rerank ($rrRecall) must not lose to raw ADC ($adcRecall)")
  }

  test("rerank rows carry exact distances consistent with their ranks") {
    val rr = Similarity.ivfPqRerankTopK(spark, sfDir).collect()
    rr.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(2))
      val ds = byRank.map(_.getDouble(3))
      assert(ds.zip(ds.tail).forall { case (x, y) => x <= y })
      assert(ds.forall(_ > 0.0))
    }
  }

  test("plan shape: query side broadcasts; no corpus self-join before the cell join") {
    val plan = Similarity.ivfPqTopK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
           plan.contains("BroadcastNestedLoopJoin"),
      "bounded query batch must be the broadcast side")
    // the index side must be projection-only up to the join: cells and
    // codes come from one scan, not a vectors-to-codes shuffle join
    assert(!plan.contains("SortMergeJoin"),
      "corpus-sized shuffle join in the ADC plan:\n" + plan)
  }
}
