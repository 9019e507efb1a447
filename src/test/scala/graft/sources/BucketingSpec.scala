package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with ZERO shuffle exchange") {
    val join = Bucketing.bucketedJoin(spark, sfDir)
    // force plan finalization with an action on the join itself
    val n = join.count()
    assert(n == Tables.load(spark, sfDir, "lineitem").count(),
      "every line has its order (FK integrity)")
    val exchanges = join.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty,
      s"bucketed join must not shuffle either side:\n" +
        join.queryExecution.executedPlan)
  }

  test("bucketed rollup equals the raw-parquet rollup bit-for-bit") {
    val bucketed = Bucketing.bucketedJoinGate(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val raw = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
           round(sum(col("l_quantity")), 2).as("sum_qty"),
           round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .collect().map(_.toString).sorted.toSeq
    assert(bucketed == raw)
  }
}
