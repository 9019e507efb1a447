package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bloom-pruned join: bit-identical to the unpruned join regardless of
  * the filter's false-positive rate, and the probe stays in the plan. */
class BloomSpec extends SparkSpec {

  private def hotOrders = Tables.load(spark, sfDir, "orders")
    .filter(col("o_totalprice") > 400000.0).select("o_orderkey")

  private def plain(joinType: String) =
    Tables.load(spark, sfDir, "lineitem")
      .join(hotOrders, col("l_orderkey") === col("o_orderkey"), joinType)

  test("inner prunedJoin equals the plain join") {
    val got = Bloom.prunedJoin(
      Tables.load(spark, sfDir, "lineitem"), "l_orderkey",
      hotOrders, "o_orderkey", expectedItems = 10000L, fpp = 0.03)
    assert(got.count() == plain("inner").count())
    assert(got.select(sum("l_quantity")).head.getDouble(0) ==
           plain("inner").select(sum("l_quantity")).head.getDouble(0))
  }

  test("result is exact even at an absurd false-positive rate") {
    // fpp 0.5: the bloom prunes almost nothing — the join must still be
    // exact because pruning only ever skips definite non-matches
    val got = Bloom.prunedJoin(
      Tables.load(spark, sfDir, "lineitem"), "l_orderkey",
      hotOrders, "o_orderkey", expectedItems = 10000L, fpp = 0.5)
    assert(got.count() == plain("inner").count())
  }

  test("left_semi prunedJoin equals the plain semi join") {
    val got = Bloom.prunedJoin(
      Tables.load(spark, sfDir, "lineitem"), "l_orderkey",
      hotOrders, "o_orderkey", 10000L, 0.03, joinType = "left_semi")
    assert(got.count() == plain("left_semi").count())
    assert(got.columns.toSeq ==
           Tables.load(spark, sfDir, "lineitem").columns.toSeq)
  }

  test("outer/anti join types are rejected") {
    val li = Tables.load(spark, sfDir, "lineitem")
    for (jt <- Seq("left_outer", "full_outer", "left_anti"))
      intercept[IllegalArgumentException] {
        Bloom.prunedJoin(li, "l_orderkey", hotOrders, "o_orderkey",
          10000L, 0.03, joinType = jt)
      }
  }

  test("the bloom probe appears in the physical plan as a filter") {
    val got = Bloom.prunedJoin(
      Tables.load(spark, sfDir, "lineitem"), "l_orderkey",
      hotOrders, "o_orderkey", 10000L, 0.03)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_long"),
      s"expected bloom probe in plan:\n$plan")
  }

  test("expression: interpreted eval agrees with codegen") {
    import graft.functions.BloomMightContainLong
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (1L to 50L).foreach(bf.putLong)
    val df = spark.range(0, 100)
      .withColumn("hit", BloomMightContainLong.mightContain(col("id"), bf))
    val hits = df.filter(col("hit")).select("id").collect().map(_.getLong(0))
    // no false negatives: every inserted key must probe true
    assert((1L to 50L).forall(hits.contains))
  }
}
