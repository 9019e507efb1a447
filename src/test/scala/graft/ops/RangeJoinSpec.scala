package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Banded range join: equality with the brute-force theta join, and the
  * no-nested-loop plan guarantee that is its entire reason to exist. */
class RangeJoinSpec extends SparkSpec {

  private def epochSec(c: org.apache.spark.sql.Column) =
    c.cast("timestamp").cast("double")

  test("errorsNearClicks equals the brute-force theta join") {
    val got = RangeJoin.errorsNearClicks(spark, sfDir)
      .select("event_id", "n_nearby", "sum_nearby_value")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet

    val ev = Tables.load(spark, sfDir, "events")
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("ts").as("ets"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("ts").as("cts"), col("value"))
    val brute = e.join(c,
        abs(epochSec(col("cts")) - epochSec(col("ets"))) <= 300.0,
        "left_outer")
      .groupBy(col("event_id"))
      .agg(count(col("cts")).as("n_nearby"),
           round(sum(col("value")), 2).as("sum_nearby_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet

    assert(got == brute)
  }

  test("every probe row appears exactly once (left-join semantics)") {
    val nErrors = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "error").count()
    assert(RangeJoin.errorsNearClicks(spark, sfDir).count() == nErrors)
  }

  test("plan is an equi-join on the band — no nested loop, no cartesian") {
    val plan = RangeJoin.errorsNearClicks(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("windowSec must be positive") {
    val ev = Tables.load(spark, sfDir, "events")
    intercept[IllegalArgumentException] {
      RangeJoin.nearbyAgg(ev, ev, windowSec = 0L, valueCol = "value")
    }
  }
}
