package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join: correctness vs a brute-force range join + the no-join
  * plan-shape guarantee. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest right row at or before each left time") {
    // both sides share the key/time/tiebreak column names (the contract)
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("k", "t", "id")
    val right = Seq((1L, 90L, 900L), (1L, 100L, 901L), (1L, 150L, 902L),
                    (2L, 60L, 903L))
      .toDF("k", "t", "id")
    val out = AsOf.asofJoin(left, right, "k", "t", "id", Seq("id"))
      .select($"k", $"t", $"id", $"asof_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 100L, 10L, Some(901L)), // equal timestamp is inclusive
      (1L, 200L, 11L, Some(902L)),
      (2L, 50L, 12L, None)))       // nothing at or before t=50
  }

  test("NULL keys never match (equi-join semantics)") {
    val left = Seq((Some(1L), 100L, 10L), (None: Option[Long], 100L, 11L))
      .toDF("k", "t", "id")
    val right = Seq((Some(1L), 90L, 900L), (None: Option[Long], 50L, 901L))
      .toDF("k", "t", "id")
    val out = AsOf.asofJoin(left, right, "k", "t", "id", Seq("id"))
      .select($"id", $"asof_id")
      .as[(Long, Option[Long])].collect().toMap
    // keyed left row matches; NULL-key left row gets NULL, not the
    // NULL-key right row that precedes it
    assert(out == Map(10L -> Some(900L), 11L -> None))
  }

  test("tolerance variant nulls matches staler than the bound") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, ts("2026-01-01 12:00:00"), 10L),
                   (2L, ts("2026-01-01 12:00:00"), 11L))
      .toDF("k", "t", "id")
    val right = Seq((1L, ts("2026-01-01 11:30:00"), 900L), // 30 min old
                    (2L, ts("2026-01-01 10:59:59"), 901L)) // 1h 1s old
      .toDF("k", "t", "id")
    val out = AsOf.asofJoinTolerance(left, right, "k", "t", "id",
                                     Seq("id"), toleranceSec = 3600L)
      .select($"id", $"asof_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(10L -> Some(900L), 11L -> None))
    // boundary: EXACTLY the tolerance is still fresh (<=)
    val rightEdge = Seq((1L, ts("2026-01-01 11:00:00"), 902L))
      .toDF("k", "t", "id")
    val edge = AsOf.asofJoinTolerance(left, rightEdge, "k", "t", "id",
                                      Seq("id"), toleranceSec = 3600L)
      .select($"id", $"asof_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(edge(10L) == Some(902L))
  }

  test("gate shape equals a brute-force range join on real events") {
    val got = AsOf.purchasesWithLastClick(spark, sfDir)
    val ev = graft.Tables.load(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pt"),
              col("event_id").as("purchase_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("ct"),
              col("event_id").as("click_id"))
    // brute force: all preceding clicks, keep the (ct, click_id)-max
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id"))
      .orderBy(col("ct").desc, col("click_id").desc)
    val brute = p.join(c, col("pu") === col("cu") && col("ct") <= col("pt"),
        "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("pu").as("user_id"),
              col("click_id").as("last_click_id"))
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("plan is a single keyed shuffle — no join operator at all") {
    val plan = AsOf.purchasesWithLastClick(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join in:\n$plan")
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one shuffle in:\n$plan")
  }

  test("cross-table as-of: counts and checksum verified driver-side") {
    val got = AsOf.eventsWithLastOrder(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"),
              unix_micros(col("o_orderdate").cast("timestamp")),
              col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val events = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"),
              unix_micros(col("ts").cast("timestamp")),
              col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expect = events.groupBy(_._3).view.mapValues { evs =>
      var withOrder = 0L
      var ck = 0L
      evs.foreach { case (u, t, _) =>
        val prior = orders.getOrElse(u, Array())
          .filter(_._2 <= t)
        if (prior.nonEmpty) {
          // max (date, orderkey) = the as-of tiebreak
          val best = prior.maxBy(o => (o._2, o._3))._3
          withOrder += 1; ck += best % 9973
        }
      }
      (evs.length.toLong, withOrder, ck)
    }.toMap
    assert(got == expect)
  }
}
