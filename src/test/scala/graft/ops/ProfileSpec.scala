package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-pass unpivot profiler: exactness against per-column aggregates,
  * single-scan plan shape. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile equals per-column aggregates, incl. null handling") {
    val df = Seq(
      (1.0, Some(2.0)), (3.0, None), (1.0, Some(5.0)), (7.0, Some(2.0)))
      .toDF("a", "b")
    val out = Profile.numericProfile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
         r.getDouble(4), r.getDouble(5))).toMap
    assert(out("a") == ((4L, 4L, 3L, 1.0, 7.0)))
    assert(out("b") == ((4L, 3L, 2L, 2.0, 5.0)))
  }

  test("one row per profiled column on the corpus table") {
    val out = Profile.lineitemProfile(spark, sfDir).collect()
    assert(out.length == 4)
    assert(out.map(_.getString(0)).toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
  }

  test("the plan scans the table once with a pruned schema") {
    val plan = Profile.lineitemProfile(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      "profiling N columns must not scan the table N times")
    // column pruning reaches the scan: only the profiled columns read
    assert(plan.contains("ReadSchema: struct<l_quantity:double," +
      "l_extendedprice:double,l_discount:double,l_tax:double>"))
  }

  test("empty column list is rejected") {
    intercept[IllegalArgumentException] {
      Profile.numericProfile(Seq((1.0, 2.0)).toDF("a", "b"), Seq.empty)
    }
  }

  test("FK integrity: orphan counts match a driver-side recompute") {
    val rows = Profile.fkIntegrity(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 6)
    // recompute the events->customer edge by hand
    val custKeys = graft.Tables.load(spark, sfDir, "customer")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val evUsers = graft.Tables.load(spark, sfDir, "events")
      .select("user_id").collect().map(_.getLong(0))
    val orphans = evUsers.filterNot(custKeys.contains)
    val (nChild, nOrph, nKeys, ck) = rows("events.user_id->customer")
    assert(nChild == evUsers.length)
    assert(nOrph == orphans.length)
    assert(nKeys == orphans.distinct.length)
    assert(ck == orphans.map(_ % 9973).sum)
    // dim chains in this corpus are referentially clean
    assert(rows("nation.n_regionkey->region")._2 == 0L)
  }

  test("chi-square: statistic recomputed driver-side, dof correct") {
    val row = Profile.chiSquare(spark, sfDir).collect()(0)
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val cells = docs.groupBy(identity).view.mapValues(_.length.toLong)
    val rt = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val chi2 = cells.map { case ((l, s2), obs) =>
      val d = obs * n - rt(l) * ct(s2)
      (d.toDouble * d.toDouble) / (n * rt(l) * ct(s2)).toDouble
    }.sum
    assert(row.getLong(0) == n)
    assert(row.getLong(3) == (rt.size - 1).toLong * (ct.size - 1))
    assert(row.getLong(4) == cells.size)
    // engine rounds to 4dp (and sums terms in DECIMAL); compare at
    // the rounding granularity
    assert(math.abs(row.getDouble(5) - chi2) < 1e-4)
  }

  test("Benford audit: digit mass conserved, probabilities sum to ~1") {
    val rows = Profile.benfordAudit(spark, sfDir).collect()
    assert(rows.length == 9, "all nine leading digits present")
    val totals = graft.Tables.load(spark, sfDir, "orders").count()
    assert(rows.map(_.getLong(1)).sum == totals,
      "every order total has a nonzero leading digit")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 0.001,
      "Benford reference distribution sums to 1")
    rows.foreach { r =>
      val d = r.getString(0).toInt
      assert(d >= 1 && d <= 9)
      val p = BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == p)
    }
  }
}
