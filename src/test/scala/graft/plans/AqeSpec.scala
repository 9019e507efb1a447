package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive Query Execution, exercised and plan-asserted — the runtime
  * levers a 100× scale-up actually relies on: skew-join splitting (one
  * hot key must not pin a straggler task) and post-shuffle partition
  * coalescing (a 1000-executor shuffle of a filtered-down stream must
  * not schedule 1000 near-empty reducers). The confs are lowered to
  * gate-scale bytes so the SAME mechanisms trigger on test data; the
  * production thresholds differ, the plan shapes do not.
  *
  * Every conf is restored after each test — the shared session runs
  * the whole suite. */
class AqeSpec extends SparkSpec {

  /** Set confs, run `f`, restore previous values (unset if absent). */
  private def withConfs[A](kvs: (String, String)*)(f: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** ~500k-row frame where key 0 holds 80% of all rows (the q48-style
    * hot-key shape, exaggerated) and the rest spread over 1000 keys. */
  private def skewedLarge: DataFrame =
    spark.range(400000).select(lit(0L).as("k"), col("id").as("v"))
      .unionAll(spark.range(100000)
        .select((col("id") % 1000 + 1).as("k"), col("id").as("v")))

  private def rightSide: DataFrame =
    spark.range(1001).select(col("id").as("k"), (col("id") * 7).as("w"))

  test("AQE splits the hot-key partition of a skewed sort-merge join") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // gate-scale thresholds (shuffle sizes are COMPRESSED bytes, so
      // far below row-count intuition): a 32 KB floor + factor 2 over
      // the median marks the hot partition skewed, and the 32 KB
      // advisory size forces a multi-way split
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32768",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      // force a shuffled sort-merge join: skew splitting is a property
      // of shuffle reads; a broadcast join has nothing to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true",
      "spark.sql.shuffle.partitions" -> "8") {
      // project to the key only so the materialized result is small;
      // collect() (not count()) drives THIS DataFrame's own query
      // execution, which is where the final adaptive plan lives
      val joined = skewedLarge.join(rightSide, Seq("k")).select(col("k"))
      val n = joined.collect().length
      assert(n == 500000, "inner join on a complete key set is lossless")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"),
        s"plan must be the post-execution adaptive plan:\n$plan")
      assert(plan.contains("skew=true"),
        s"hot-key partition must be marked skew-split:\n$plan")
      assert(plan.contains("AQEShuffleRead"),
        s"adaptive shuffle reads must be present:\n$plan")
    }
  }

  test("AQE coalesces near-empty post-shuffle partitions") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // small parallelism floor so coalescing is allowed to shrink far
      // below the configured partition count
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.shuffle.partitions" -> "64") {
      // a few KB of aggregated data scattered over 64 shuffle
      // partitions: AQE must fuse them instead of scheduling 64
      // near-empty reducers
      val agg = spark.range(10000)
        .select((col("id") % 50).as("k"), col("id").as("v"))
        .groupBy("k").agg(sum(col("v")).as("s"))
      assert(agg.collect().length == 50)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"post-shuffle partitions must be coalesced:\n$plan")
    }
  }

  test("salted join and AQE skew join agree on the skewed shape") {
    // the two skew answers must be value-identical — AQE re-plans the
    // physical read, salting rewrites the logical join; neither may
    // change results
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val plain = skewedLarge.join(rightSide, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
        .head
      val salted = graft.ops.Skew
        .saltedJoin(skewedLarge, rightSide, "k", salts = 8)
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
        .head
      assert(plain.getLong(0) == salted.getLong(0))
      assert(plain.getLong(1) == salted.getLong(1))
    }
  }
}
