package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Batch event analytics: hourly rollup + sessionization. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: 30-minute gap starts a new session (hand-built)") {
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), "u1"),
      (2L, ts("2026-01-01 10:10:00"), "u1"), // same session (10 min)
      (3L, ts("2026-01-01 11:00:00"), "u1"), // new session (50 min gap)
      (4L, ts("2026-01-01 09:00:00"), "u2")  // single-event session
    ).toDF("event_id", "ts", "user_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val out = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 1L)
          .when(col("ts").cast("double") -
                col("prev_ts").cast("double") > 1800.0, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("new_session").as("n_sessions"))
    assertSameRows(out, Seq(Row("u1", 3L, 2L), Row("u2", 1L, 1L)))
  }

  test("sessionize over sf0.001: sessions <= events, >= 1 per active user") {
    val df = Events.sessionize(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_sessions") > col("n_events")).count() == 0)
    assert(df.filter(col("n_sessions") < 1).count() == 0)
    df.unpersist()
  }

  test("hourlyAgg: group count equals raw count") {
    val df = Events.hourlyAgg(spark, sfDir)
    val total = df.agg(sum("n")).as[Long].head()
    val raw = graft.Tables.load(spark, sfDir, "events").count()
    assert(total == raw)
  }

  test("events ts column reads as NTZ microseconds (nanos truncated)") {
    val df = graft.Tables.load(spark, sfDir, "events")
    assert(df.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(df.filter(col("ts").isNull).count() == 0)
  }

  test("distinctAgg: unique users bounded by events; Expand plan used") {
    val df = Events.distinctAgg(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_users") > col("n_events")).count() == 0)
    assert(df.filter(col("n_days") > col("n_events")).count() == 0)
    assert(df.filter(col("n_users") < 1 || col("n_days") < 1).count() == 0)
    // two distinct columns force the Expand-based distinct rewrite
    val plan = Events.distinctAgg(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    df.unpersist()
  }

  test("trailingHourCounts equals a brute-force self-count") {
    val df = Events.trailingHourCounts(spark, sfDir).cache()
    val events = df.select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).sorted }
    val hourUs = 3600L * 1000000L
    df.collect().foreach { r =>
      val (u, ts, n) = (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
                        r.getAs[Long]("n_prev_hour"))
      val expect = events(u).count(t => t >= ts - hourUs && t <= ts)
      assert(n == expect, s"user $u at $ts: $n != $expect")
    }
    assert(df.filter(col("n_prev_hour") < 1).count() == 0,
      "frame includes the current row")
    df.unpersist()
  }

  test("hourlyAnomalies: |z| > sigma for every flagged hour, none missed") {
    val sigma = 2.0
    val anom = Events.hourlyAnomalies(spark, sfDir, sigma).cache()
    assert(anom.count() > 0, "synthetic counts include >2-sigma hours")
    assert(anom.filter(abs(col("z")) <= sigma).count() == 0,
      "every flagged hour must exceed the threshold")
    // completeness: flagged count equals the brute-force z computation
    val hourly = graft.Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val expected = hourly.groupBy(_._1).map { case (_, rows) =>
      val cs = rows.map(_._2.toDouble)
      val n = cs.length.toDouble
      val mean = cs.sum / n
      val varS = cs.map(c => (c - mean) * (c - mean)).sum / (n - 1)
      cs.count(c => math.abs(c - mean) > sigma * math.sqrt(varS))
    }.sum
    assert(anom.count() == expected)
    anom.unpersist()
  }

  test("retention cohorts partition users; returners bounded by cohort") {
    import org.apache.spark.sql.functions._
    val out = Events.retentionCohorts(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("ret_1") > col("n_users") ||
                      col("ret_7") > col("n_users")).count() == 0)
    // cohorts partition the user base: sizes sum to total distinct users
    val totalUsers = graft.Tables.load(spark, sfDir, "events")
      .select(countDistinct(col("user_id"))).head.getLong(0)
    assert(out.agg(sum("n_users")).head.getLong(0) == totalUsers)
    // non-vacuous: someone comes back the next day
    assert(out.agg(sum("ret_1")).head.getLong(0) > 0)
    out.unpersist()
  }

  test("rollingWau equals a driver-side trailing-window recompute") {
    def day(x: Any): java.time.LocalDate = x match {
      case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
      case d: java.time.LocalDateTime => d.toLocalDate
    }
    val pairs = graft.Tables.load(spark, sfDir, "events")
      .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
      .distinct().collect()
      .map(r => day(r.get(0)) -> r.getLong(1))
    val byDay = pairs.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val expected = byDay.keys.map { d =>
      d -> (0 until 7).flatMap(i => byDay.getOrElse(d.minusDays(i), Set()))
        .toSet.size.toLong
    }.toMap
    val got = Events.rollingWau(spark, sfDir).collect()
      .map(r => day(r.get(0)) -> r.getLong(1)).toMap
    assert(got == expected)
    // WAU >= any single day's DAU inside its window
    assert(got.forall { case (d, w) => w >= byDay(d).size })
  }

  test("journey trigrams: mass conservation and deterministic top-k") {
    val rows = Events.journeyTrigrams(spark, sfDir, topK = 20).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // every path is three >-joined known types
    rows.foreach(r => assert(r.getString(0).split(">").length == 3))
    // descending counts with path tiebreak
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sameElements(pairs.sortBy { case (n, p) => (-n, p) }))
    // total trigram mass (over ALL paths, not just top-k) = sum over
    // users of max(0, n_events - 2)
    val all = Events.journeyTrigrams(spark, sfDir, topK = Int.MaxValue)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    val perUser = graft.Tables.load(spark, sfDir, "events")
      .groupBy("user_id").count().collect()
      .map(r => math.max(0L, r.getLong(1) - 2)).sum
    assert(all == perUser, s"$all != $perUser")
  }

  test("segment conversion: driver-side sessionized funnel recompute") {
    val got = Events.segmentConversion(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute: sessions by 30-min gaps, converted = first click
    // followed (inclusively) by a purchase, joined to segment
    val seg = graft.Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val evs = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts").cast("timestamp").cast("double"),
              col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    val expect = scala.collection.mutable.Map[String, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    evs.groupBy(_._1).foreach { case (user, rows) =>
      seg.get(user).foreach { s =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        var sessions = List.newBuilder[Seq[(Long, Double, Long, String)]]
        var cur = List.newBuilder[(Long, Double, Long, String)]
        var prev = Double.NaN
        sorted.foreach { e =>
          if (!prev.isNaN && e._2 - prev > 1800.0) {
            sessions += cur.result(); cur = List.newBuilder
          }
          cur += e; prev = e._2
        }
        sessions += cur.result()
        sessions.result().foreach { sess =>
          val clicks = sess.filter(_._4 == "click").map(_._2)
          if (clicks.nonEmpty) {
            val fc = clicks.min
            val conv = sess.exists(e => e._4 == "purchase" && e._2 >= fc)
            val (a, b) = expect(s)
            expect(s) = (a + 1, b + (if (conv) 1L else 0L))
          }
        }
      }
    }
    assert(got == expect.toMap)
  }

  test("gap fill: complete spine, gaps carry the last present value") {
    val rows = Events.gapFillHourly(spark, sfDir).collect()
    val agg = graft.Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
             .as("sv"))
      .collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getDouble(2))
      .toMap
    // spine completeness: hours x types
    val hours = rows.map(_.get(0).toString).distinct.sorted
    val types = rows.map(_.getString(1)).distinct
    assert(rows.length == hours.length * types.length)
    // present cells keep their value; gap cells carry the previous one
    types.foreach { t =>
      var carry: Option[Double] = None
      hours.foreach { h =>
        val r = rows.find(r => r.get(0).toString == h && r.getString(1) == t).get
        agg.get((h, t)) match {
          case Some(v) =>
            assert(r.getLong(2) == 0L && r.getDouble(3) == v)
            carry = Some(v)
          case None =>
            assert(r.getLong(2) == 1L)
            carry match {
              case Some(v) => assert(r.getDouble(3) == v, s"carry at $h/$t")
              case None => assert(r.isNullAt(3), "leading gap stays null")
            }
        }
      }
    }
  }

  test("cumulative reach: monotone, ends at total distinct users") {
    val rows = Events.cumulativeReach(spark, sfDir).collect()
      .sortBy(_.get(0).toString)
    val cums = rows.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    val total = graft.Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(cums.last == total)
    assert(rows.map(_.getLong(1)).sum == total,
      "every user is new exactly once")
  }

  test("trending scores: exact integer decay recompute (62-day horizon)") {
    // mirrors the operator's horizon clamp: effMaxAge = min(span, 61),
    // rows older than that are excluded (the clamp is what keeps the
    // 2^k weight inside a BIGINT on wide corpora — an unclamped
    // recompute here would itself wrap at k >= 63 the day the events
    // fixture regenerates with a span > 62 days)
    val got = Events.trendingScores(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val days = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"),
              date_trunc("day", col("ts")).cast("timestamp").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400))
    val maxDay = days.map(_._2).max
    val effMaxAge = math.min(maxDay - days.map(_._2).min, 61L)
    val inHorizon = days.filter(r => maxDay - r._2 <= effMaxAge)
    val expect = inHorizon.groupBy(_._1).map { case (t, rows) =>
      // accumulate exactly in BigInt, present as double — mirrors the
      // operator's DECIMAL(38,0) discipline
      t -> (rows.length.toLong,
            rows.map(r => BigInt(1) <<
              (effMaxAge - (maxDay - r._2)).toInt).sum.toDouble)
    }
    assert(got == expect)
  }

  test("trending scores: horizon clamp drops >62-day-old rows exactly") {
    import spark.implicits._
    // synthetic corpus spanning 100 days: one event per day for type A,
    // plus an ancient spike — the clamp must weight only the trailing
    // 62 days and the ancient rows must not wrap the shift
    val base = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
    val rows = (0 until 100).map(d =>
      ("A", java.sql.Timestamp.valueOf(base.plusDays(d)))) ++
      Seq.fill(5)(("B", java.sql.Timestamp.valueOf(base)))
    val df = rows.toDF("event_type", "ts")
    // drive the REAL operator core on the synthetic frame
    val out = Events.trendingScoresFrom(
        df.select(col("event_type"), date_trunc("day", col("ts")).as("d")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // A: only the trailing 62 days survive; weights 2^61 .. 2^0 exactly
    assert(out("A")._1 == 62L)
    assert(out("A")._2 ==
      (0 to 61).map(k => BigInt(1) << k).sum.toDouble)
    // B: 99 days old — outside the horizon entirely
    assert(!out.contains("B"))
  }

  test("trending scores: sum survives >Long.MaxValue (no int64 wrap)") {
    import spark.implicits._
    // 62-day span pins effMaxAge at 61; FIVE events on the newest day
    // carry weight 5*2^61 > Long.MaxValue — an int64 sum wraps negative,
    // the DECIMAL(38,0) accumulation must not
    val base = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
    val rows = (0 until 62).map(d =>
      ("A", java.sql.Timestamp.valueOf(base.plusDays(d)))) ++
      Seq.fill(4)(("A", java.sql.Timestamp.valueOf(base.plusDays(61))))
    val out = Events.trendingScoresFrom(
        rows.toDF("event_type", "ts")
          .select(col("event_type"), date_trunc("day", col("ts")).as("d")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = (0 to 61).map(k => BigInt(1) << k).sum +
      BigInt(4) * (BigInt(1) << 61)
    assert(exact > BigInt(Long.MaxValue), "fixture must actually overflow")
    assert(out("A")._1 == 66L)
    assert(out("A")._2 == exact.toDouble, "score wrapped or drifted")
    assert(out("A")._3 == 1.0)
  }

  test("rolling anomalies: every flagged row verifies against its own window") {
    val daily = graft.Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
    val flagged = Events.rollingAnomalies(spark, sfDir).collect()
    flagged.foreach { r =>
      val (d, t, n) = (r.get(0).toString, r.getString(1), r.getLong(2))
      val base = daily.filter(x => x._2 == t && x._1 < d &&
        java.time.LocalDateTime.parse(x._1.replace(' ', 'T'))
          .isAfter(java.time.LocalDateTime.parse(d.replace(' ', 'T'))
            .minusDays(7).minusSeconds(1)))
        .map(_._3)
      assert(base.length >= 3, s"baseline floor for $d/$t")
      val nb = base.length.toLong
      val s1 = base.sum; val s2 = base.map(x => x * x).sum
      val mean = s1.toDouble / nb
      val varz = (nb * s2 - s1 * s1).toDouble / (nb * nb).toDouble
      val z = (n - mean) / math.sqrt(varz)
      assert(math.abs(z) >= 2.0, s"z=$z for $d/$t")
      assert(r.getDouble(4) == BigDecimal(z).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(flagged.nonEmpty, "fixture should contain anomalies")
  }

  test("basket pairs: supports and confidences recomputed driver-side") {
    val rows = Events.basketPairs(spark, sfDir).collect()
    val presence = graft.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = presence.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toMap
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(ta < tb)
      val (sa, sb) = (byType(ta), byType(tb))
      val both = sa.intersect(sb).size.toLong
      assert(r.getLong(2) == sa.size && r.getLong(3) == sb.size)
      assert(r.getLong(4) == both)
      assert(r.getDouble(5) == BigDecimal(both.toDouble / sa.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(rows.length == 10, "5 types -> C(5,2) pairs in this corpus")
  }

  test("week-over-week: null first week per type, change recomputed") {
    val rows = Events.weekOverWeek(spark, sfDir).collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
                 r.getDouble(3), if (r.isNullAt(4)) None
                                 else Some(r.getDouble(4))))
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._1)
      assert(sorted.head._5.isEmpty, "first week has no prior")
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          val expect = BigDecimal((cur._4 - prev._4) / prev._4)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          // recompute from the ROUNDED sums is within a rounding step of
          // the engine's exact-decimal change
          assert(cur._5.isDefined &&
                 math.abs(cur._5.get - expect) < 0.001)
        case _ =>
      }
    }
    assert(rows.nonEmpty)
  }

  test("stickiness: DAU <= WAU, ratio in (0,1], WAU matches rollingWau") {
    val rows = Events.stickiness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "DAU <= WAU")
      val st = r.getDouble(3)
      assert(st > 0.0 && st <= 1.0)
    }
    val wau = Events.rollingWau(spark, sfDir).collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) == wau(r.get(0).toString)))
  }

  test("time-to-convert: gaps recomputed driver-side") {
    val row = Events.timeToConvert(spark, sfDir).collect()(0)
    val evs = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
              unix_micros(col("ts").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val purchases = evs.filter(_._2 == "purchase")
      .groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    val gaps = evs.filter(_._2 == "click").flatMap { case (u, _, cts) =>
      purchases.getOrElse(u, Seq.empty[Long])
        .find(p => p >= cts && p <= cts + 3600L * 1000000L)
        .map(p => (p - cts) / 1000000L)
    }
    assert(row.getLong(0) == gaps.length)
    val mean = BigDecimal(gaps.sum.toDouble / gaps.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(1) == mean)
    // percentile (n-1)q interpolation on the sorted gaps
    def pct(q: Double): Double = {
      val s = gaps.sorted.map(_.toDouble)
      val pos = (s.length - 1) * q
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    assert(math.abs(row.getDouble(2) - pct(0.5)) < 1e-9)
    assert(math.abs(row.getDouble(3) - pct(0.9)) < 1e-9)
  }

  test("cohort retention: offset-0 is always 1.0, matrix is a triangle") {
    val rows = Events.cohortRetention(spark, sfDir).collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // offset 0: every cohort member is active in their first week
    rows.filter(_._2 == 0L).foreach { case (_, _, cn, an, ret) =>
      assert(cn == an && ret == 1.0)
    }
    // retention never exceeds 1; active never exceeds cohort
    rows.foreach { case (_, _, cn, an, ret) =>
      assert(an <= cn && ret <= 1.0 && ret > 0.0)
    }
    // cohort sizes partition the user base
    val total = graft.Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    val sizes = rows.filter(_._2 == 0L).map(_._3).sum
    assert(sizes == total)
  }
}
