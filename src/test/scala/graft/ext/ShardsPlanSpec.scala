package graft.ext

import graft.SparkSpec

/** Physical-plan shape of the round-7 delivery/dedup gates: the shuffle
  * count is the scale contract, so assert it the way RangeJoinSpec and
  * CdcSpec do for theirs. */
class ShardsPlanSpec extends SparkSpec {

  private def exchanges(plan: String): Int =
    "(?m)^.*Exchange (hash|range)partitioning".r
      .findAllIn(plan).length

  test("shuffleShards plan: one shard shuffle reused by window and agg") {
    val plan = Splits.shuffleShards(spark, sfDir)
      .queryExecution.executedPlan.toString
    // window partitions by shard; the following groupBy(shard) must
    // reuse that partitioning — a second exchange would mean the
    // aggregate reshuffles what the window already co-located
    assert(exchanges(plan) == 1, s"expected exactly 1 exchange:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("writeShards plan: one range exchange, in-partition sort only") {
    // capture the plan of the frame writeShards writes (rebuild it the
    // same way rather than writing files)
    import org.apache.spark.sql.functions._
    val key = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":graft"))), 1, 15), 16, 10).cast("long")
    val framed = graft.Tables.load(spark, sfDir, "documents")
      .withColumn("k", key)
      .withColumn("shard", col("k") % 8)
      .repartitionByRange(8, col("shard"))
      .sortWithinPartitions(col("shard"), col("k"), col("doc_id"))
    val plan = framed.queryExecution.executedPlan.toString
    assert(exchanges(plan) == 1, s"expected exactly 1 exchange:\n$plan")
    // the sort must be partition-local (global=false in the Sort node)
    assert(plan.contains("Sort ") &&
           !"""Sort \[[^\]]*\], true""".r.findFirstIn(plan).isDefined)
  }
}
