package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HLL + count-min sketches (q109/q110): accuracy in the working
  * regime, the CMS overestimate invariant, and merge-by-construction
  * (the properties that make the sketches usable at 100 TB). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL raw estimate is within ±10% in its working regime (n >> 2.5m)") {
    // 20k distinct keys against m=256 registers: standard error
    // 1.04/sqrt(256) ≈ 6.5%
    val df = (1 to 20000).map(i => ("a", i)).toDF("g", "k")
    val row = Sketches.hllSketchDf(df, col("g"), col("k")).head()
    val est = row.getAs[Double]("est")
    assert(math.abs(est - 20000.0) / 20000.0 < 0.10,
      s"HLL estimate $est too far from 20000")
    assert(row.getAs[Long]("n_zero_regs") == 0L)
  }

  test("HLL is insensitive to duplication (estimates distinct, not rows)") {
    val base = (1 to 5000).map(i => ("a", i))
    val dup = base ++ base ++ base
    val e1 = Sketches.hllSketchDf(base.toDF("g", "k"), col("g"), col("k"))
      .head().getAs[Double]("est")
    val e3 = Sketches.hllSketchDf(dup.toDF("g", "k"), col("g"), col("k"))
      .head().getAs[Double]("est")
    assert(e1 == e3, "register maxes must be duplication-invariant")
  }

  test("gate output: small-range overshoot is bounded and flagged by n_zero_regs") {
    val out = Sketches.hllDistinctUsers(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("est")
      // far below the 2.5m threshold the raw estimate degenerates to
      // the alpha*m floor (~184 for m=256) — it OVERSHOOTS, bounded by
      // the near-empty-sketch constant; est_corrected applies linear
      // counting there and must land in a TIGHT band (LC std error at
      // n≈150, m=256 is ~3%; allow 10%)
      assert(est >= exact, s"raw small-range estimate must overshoot: " +
        s"$est < $exact")
      assert(est <= 1000.0, s"estimate $est above the near-empty ceiling")
      assert(r.getAs[Long]("n_zero_regs") > 0L)
      val corr = r.getAs[Double]("est_corrected")
      assert(math.abs(corr - exact) / exact < 0.10,
        s"linear counting should be tight at n=$exact: got $corr")
      assert(math.abs(corr - exact) < math.abs(est - exact),
        s"correction must improve on the raw estimate ($corr vs $est)")
    }
  }

  test("linear counting: tight at small n, inert in the working regime, series matches libm") {
    // sweep the small-range regime: LC std error sqrt(m(e^t - t - 1))/n
    // with t = n/m is ~3-5% here; each n is ONE deterministic hash
    // draw, so allow 3σ (15%) — the i*7919 draw at n=150 sits at -11%
    for (n <- Seq(20, 80, 150, 300)) {
      val df = (1 to n).map(i => ("a", i * 7919)).toDF("g", "k")
      val r = Sketches.hllSketchDf(df, col("g"), col("k")).head()
      val corr = r.getAs[Double]("est_corrected")
      assert(math.abs(corr - n) / n < 0.15,
        s"LC at n=$n: got $corr")
      // the deterministic atanh-series ln must agree with libm ln to
      // ~1e-11 relative: recompute m*ln(m/V) driver-side
      val v = r.getAs[Long]("n_zero_regs").toDouble
      if (v > 0 && r.getAs[Double]("est") <= 640.0) {
        val libm = 256.0 * math.log(256.0 / v)
        assert(math.abs(corr - libm) / libm < 1e-10,
          s"series ln drifted: $corr vs $libm")
      }
    }
    // large n: correction must NOT fire (est > 2.5m) — est_corrected == est
    val big = (1 to 20000).map(i => ("a", i)).toDF("g", "k")
    val rb = Sketches.hllSketchDf(big, col("g"), col("k")).head()
    assert(rb.getAs[Double]("est_corrected") == rb.getAs[Double]("est"))
  }

  test("CMS: estimates never undercount, and top tokens are exact at gate scale") {
    val out = Sketches.cmsTopTokens(spark, sfDir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val t = r.getAs[Long]("n_true"); val e = r.getAs[Long]("n_est")
      assert(e >= t, s"CMS undercounted ${r.getString(0)}: $e < $t")
    }
    // d=4 x w=512 against the small synthetic vocab: collisions are
    // rare enough that the min over 4 rows recovers the exact count
    // for heavy hitters (overestimate bound e*N/w per row)
    val exactFrac = out.count(r =>
      r.getAs[Long]("n_true") == r.getAs[Long]("n_est")).toDouble / 20.0
    assert(exactFrac >= 0.8, s"too many collisions: $exactFrac exact")
  }

  test("CMS counter table is fixed-size regardless of corpus volume") {
    // the counter materialization inside cmsTopTokens groups to at most
    // d x w cells; verify on the real corpus
    val toks = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(split(TextAnalysis.normalized(col("text")), " "))
        .as("token")).filter(col("token") =!= "")
    val cells = toks.count() // corpus token volume, for the message
    val counters = Sketches.cmsTopTokens(spark, sfDir)
    assert(counters.count() == 20,
      s"point-query output must be bounded (corpus had $cells tokens)")
  }

  test("HLL merge: register-max of two halves equals the full sketch") {
    // the mergeability claim the 100 TB story rests on: 1000 executors
    // sketch independently and combine by register max
    val all = (1 to 8000).map(i => ("a", i))
    val (h1, h2) = all.splitAt(all.size / 2)
    def regs(rows: Seq[(String, Int)]) = Sketches
      .registerRhoRows(rows.toDF("g", "k"), col("g"), col("k"))
      .groupBy(col("g"), col("idx")).agg(max(col("rho")).as("r"))
    val merged = regs(h1).unionByName(regs(h2))
      .groupBy(col("g"), col("idx")).agg(max(col("r")).as("r"))
    val full = regs(all)
    val a = Sketches.foldRegisters(merged).collect().map(_.toString).sorted
    val b = Sketches.foldRegisters(full).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("AMS join-size estimate: unbiased signed sketch tracks the exact count") {
    val row = Sketches.amsJoinSizeEstimate(spark, sfDir).head()
    val (exact, est, relErr) =
      (row.getLong(0), row.getLong(1), row.getDouble(2))
    // the real join at sf0.001 (every lineitem has an order)
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    assert(exact == li.count(), "orderkey join is 1:N — exact = |lineitem|")
    assert(relErr == BigDecimal((est - exact).toDouble / exact)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // std ~ sqrt(F2(R) F2(S) / w): a few percent here; allow wide margin
    assert(math.abs(relErr) < 0.5,
      s"estimate off by ${relErr}x — sketch broken?")
    // deterministic: same sketch, same estimate
    val again = Sketches.amsJoinSizeEstimate(spark, sfDir).head()
    assert(again.getLong(1) == est)
  }

  test("histogram quantiles: error bound certified, estimates bracket exact") {
    val rows = Sketches.histogramQuantiles(spark, sfDir).collect()
    assert(rows.length == 15, "5 types x 3 quantiles")
    rows.foreach { r =>
      val (est, exact, err, w) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      // lower-edge estimate: est <= exact < est + bin_width
      assert(est <= exact + 1e-9, s"est $est > exact $exact")
      assert(exact < est + w + 1e-9, s"exact $exact outside bin of $est + $w")
      assert(err < w + 1e-9, "certified error bound")
    }
    // p50 <= p90 <= p99 within each type (monotone quantiles)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byPct = rs.map(r => r.getLong(1) -> r.getDouble(4)).toMap
      assert(byPct(50L) <= byPct(90L) && byPct(90L) <= byPct(99L))
    }
  }

  test("histogram sketch is mergeable: half-corpus bins sum to the full bins") {
    // the sketch property: bin counts add across any split of the data
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"),
              (round(col("value") * 100)).cast("long").as("c"))
    val bounds = ev.groupBy("event_type")
      .agg(min("c").as("minc"), max("c").as("maxc"))
      .withColumn("w", (col("maxc") - col("minc") + 1000L) / 1000L)
      .withColumn("w", col("w").cast("long"))
    def hist(df: org.apache.spark.sql.DataFrame) =
      df.join(broadcast(bounds), Seq("event_type"))
        .withColumn("bin", ((col("c") - col("minc")) / col("w")).cast("long"))
        .groupBy("event_type", "bin").count()
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val full = hist(ev)
    val h1 = hist(ev.filter(col("c") % 2 === 0))
    val h2 = hist(ev.filter(col("c") % 2 =!= 0))
    val merged = (h1.keySet ++ h2.keySet).map(k =>
      k -> (h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L))).toMap
    assert(merged == full)
  }
}
