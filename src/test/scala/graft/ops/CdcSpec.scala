package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC merge: hand-built changesets with every op combination, plan
  * shape, and the corpus gate's conservation laws. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "v")

  test("upsert replaces matched rows, inserts unmatched; delete removes") {
    val changes = Seq(
      (2L, "b2", 21.0, "upsert"),   // update
      (3L, "c", 30.0, "delete"),    // delete
      (9L, "i", 90.0, "upsert"))    // insert
      .toDF("k", "name", "v", "op")
    val out = Cdc.merge(snap, changes, "k")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(out == Map(
      1L -> ("a", 10.0), 2L -> ("b2", 21.0),
      4L -> ("d", 40.0), 9L -> ("i", 90.0)))
  }

  test("empty changeset is the identity") {
    val changes = Seq.empty[(Long, String, Double, String)]
      .toDF("k", "name", "v", "op")
    val out = Cdc.merge(snap, changes, "k")
    assert(out.exceptAll(snap).isEmpty && snap.exceptAll(out).isEmpty)
  }

  test("merge plan is a key anti-join + union — no cartesian, no NLJ") {
    val changes = Seq((2L, "b2", 21.0, "upsert")).toDF("k", "name", "v", "op")
    val plan = Cdc.merge(snap, changes, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("corpus gate anti-join BROADCASTS the change keys — snapshot " +
       "shuffles zero times") {
    val plan = Cdc.customerMerge(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the scaladoc's scale claim, plan-asserted like RangeJoinSpec: the
    // anti side must be a broadcast hash join (change keys to the
    // executors), never a sort-merge join (which would shuffle the
    // 100 TB snapshot on key)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
           s"anti join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"snapshot got shuffled:\n$plan")
    // (the insert branch's 1-row max-key broadcast legitimately appears
    // as a broadcast nested-loop CROSS join — only a cartesian of real
    // tables is forbidden)
    assert(!plan.contains("CartesianProduct"))
  }

  test("corpus gate conserves rows: snapshot - deletes + inserts") {
    val base = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"))
    val n = base.count()
    val nDel = base.filter(
      col("c_custkey") % 11 === 3 && col("c_custkey") % 7 =!= 0).count()
    val nIns = base.filter(col("c_custkey") % 13 === 5).count()
    val out = Cdc.customerMerge(spark, sfDir)
    assert(out.count() == n - nDel + nIns)
    // keys unique after merge (whole-row replacement, no duplicates)
    assert(out.groupBy("c_custkey").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("latest-per-key equals the window argmax and plans without a sort") {
    import org.apache.spark.sql.expressions.Window
    val got = Cdc.latestPerKey(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val expect = graft.Tables.load(spark, sfDir, "events")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "ts", "event_id", "value")
      .collect().map(_.toString).sorted.toSeq
    assert(got == expect)
    // the scale point: a partial-aggregating max_by, not a window sort
    val plan = Cdc.latestPerKey(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
    assert(plan.contains("partial_max_by") || plan.contains("max_by"),
      s"max_by partial aggregation expected:\n$plan")
  }
}
