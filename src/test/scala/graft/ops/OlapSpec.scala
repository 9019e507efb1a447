package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-level aggregation operators: ROLLUP / CUBE / GROUPING SETS /
  * PIVOT / exact percentiles, plus the TF-IDF top-terms extractor. */
class OlapSpec extends SparkSpec {

  private def li = graft.Tables.load(spark, sfDir, "lineitem")

  test("rollup emits pair, per-flag, and grand-total levels") {
    val pairs = li.select("l_returnflag", "l_linestatus").distinct().count()
    val flags = li.select("l_returnflag").distinct().count()
    val out = Olap.rollupAgg(spark, sfDir).cache()
    assert(out.count() == pairs + flags + 1)
    // grand total row aggregates everything
    val total = out.filter(col("l_returnflag").isNull &&
                           col("l_linestatus").isNull)
      .select("n").collect().head.getLong(0)
    assert(total == li.count())
    out.unpersist()
  }

  test("cube adds the per-status level on top of rollup") {
    val pairs = li.select("l_returnflag", "l_linestatus").distinct().count()
    val flags = li.select("l_returnflag").distinct().count()
    val stats = li.select("l_linestatus").distinct().count()
    assert(Olap.cubeAgg(spark, sfDir).count() == pairs + flags + stats + 1)
  }

  test("grouping sets emits exactly the requested levels") {
    val flags = li.select("l_returnflag").distinct().count()
    val stats = li.select("l_linestatus").distinct().count()
    assert(Olap.groupingSets(spark, sfDir).count() == flags + stats + 1)
  }

  test("rollup is one Expand + one shuffle, not a pass per level") {
    // AQE wraps the physical plan, so count exchanges in the rendered
    // initial plan rather than collecting node instances
    val s = Olap.rollupAgg(spark, sfDir).queryExecution.executedPlan.toString
    assert(s.contains("Expand"), s"rollup should plan through Expand:\n$s")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(s).size
    assert(exchanges == 1,
      s"rollup should shuffle exactly once, found $exchanges:\n$s")
  }

  test("pivot columns partition the hourly event counts") {
    val out = Olap.pivotHourlyTypes(spark, sfDir).cache()
    val pivotTotal = out.select(
      sum(col("n_click") + col("n_error") + col("n_purchase") +
          col("n_signup") + col("n_view")))
      .collect().head.getLong(0)
    assert(pivotTotal == graft.Tables.load(spark, sfDir, "events").count())
    assert(out.count() ==
      graft.Tables.load(spark, sfDir, "events")
        .select(date_trunc("hour", col("ts"))).distinct().count())
    out.unpersist()
  }

  test("exact percentiles are ordered and within the value range") {
    val rows = Olap.percentiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90) = (r.getDouble(1), r.getDouble(2))
      assert(p50 <= p90 && p50 >= 1.0 && p90 <= 50.0)
    }
  }

  test("tfidf top terms: <= k per doc, ranks contiguous, score exact") {
    val out = graft.ext.TextAnalysis.tfidfTopTerms(spark, sfDir, k = 3).cache()
    val perDoc = out.groupBy("doc_id").agg(
      count(lit(1)).as("c"), max(col("rnk")).as("maxr"))
    assert(perDoc.filter(col("c") > 3 || col("maxr") =!= col("c")).count() == 0)
    // integer score definition holds row by row
    assert(out.filter(col("score") =!=
      expr("n_tf * 1000000 div df")).count() == 0)
    out.unpersist()
  }
}
