package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The within-cluster spectrum probe (q235 + the ANN decision input):
  * the scalar reductions (participation ratio, top-eigenvalue share)
  * against an independent in-memory covariance + eigensolve, and the
  * regime-separation property on constructed geometries. */
class ClusterSpectrumSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  /** Independent model: quantize exactly as the operator defines
    * (scale-3 half-up), full-precision covariance, Jacobi-free top
    * eigenvalue via many power iterations on the dense matrix. */
  private def model(vecs: Seq[Array[Double]])
      : (Double, Double, Double, Double) = {
    val n = vecs.length
    val q = vecs.map(_.map(x => java.math.BigDecimal.valueOf(x)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()))
    val mu = Array.tabulate(Dim)(i => q.map(_(i)).sum / n)
    val cov = Array.tabulate(Dim, Dim)((i, j) =>
      q.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / n)
    val tr = (0 until Dim).map(i => cov(i)(i)).sum
    val fro2 = (for (i <- 0 until Dim; j <- 0 until Dim)
      yield cov(i)(j) * cov(i)(j)).sum
    var v = Array.fill(Dim)(1.0 / math.sqrt(Dim.toDouble))
    for (_ <- 1 to 500) {
      val w = Array.tabulate(Dim)(i =>
        (0 until Dim).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      if (nrm > 0) v = w.map(_ / nrm)
    }
    val lam = (0 until Dim).map(i => v(i) *
      (0 until Dim).map(j => cov(i)(j) * v(j)).sum).sum
    (tr, fro2, tr * tr / fro2, lam / tr)
  }

  test("per-cell stats match an independent in-memory recompute") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val got = Similarity.clusterSpectrum(emb, col("label"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
         r.getDouble(5))).toMap
    val raw = emb.select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.keySet == raw.keySet)
    for ((cell, vecs) <- raw) {
      val (tr, fro2, pr, top) = model(vecs)
      val (n, gTr, gFro2, gPr, gTop) = got(cell)
      assert(n == vecs.length)
      // covariance numerators are EXACT over the quantized elements;
      // the only differences vs the model are double-summation order —
      // agreement must be near machine precision
      assert(math.abs(gTr - tr) <= 1e-9 * math.max(1.0, tr), s"cell $cell")
      assert(math.abs(gFro2 - fro2) <= 1e-9 * math.max(1.0, fro2))
      assert(math.abs(gPr - pr) <= 1e-6 * pr, s"cell $cell pr")
      assert(math.abs(gTop - top) <= 1e-6, s"cell $cell top_share")
    }
  }

  test("gate moments are the exact covariance numerators") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val moms = Similarity.clusterSpectrumMoments(emb, col("label"))
      .collect()
    // one row per (cell, i<=j), full triangle per cell
    val cells = moms.map(_.getInt(0)).distinct
    assert(moms.length == cells.length * Dim * (Dim + 1) / 2)
    // diagonal numerators are n^2 * variance >= 0
    moms.filter(r => r.getInt(1) == r.getInt(2))
      .foreach(r => assert(r.getDouble(3) >= 0.0))
    // spot-exactness: recompute one cell's (1,1) numerator from raw data
    val c0 = cells.min
    val xs = emb.filter(col("label") === c0)
      .select(element_at(col("embedding"), 1).cast("double"))
      .collect().map(_.getDouble(0))
      .map(x => java.math.BigDecimal.valueOf(x)
        .setScale(3, java.math.RoundingMode.HALF_UP))
    val n = java.math.BigDecimal.valueOf(xs.length.toLong)
    val s = xs.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    val m = xs.foldLeft(java.math.BigDecimal.ZERO)((a, x) =>
      a.add(x.multiply(x)))
    val want = m.multiply(n).subtract(s.multiply(s)).doubleValue()
    val gotC2 = moms.find(r => r.getInt(0) == c0 && r.getInt(1) == 1 &&
                               r.getInt(2) == 1).get.getDouble(3)
    assert(gotC2 == want, "exact numerator, bit for bit")
  }

  test("the probe separates isotropic from low-rank geometry") {
    // the decision property the ScaleSmoke table measures at corpus
    // scale, pinned here on constructed Gaussians: isotropic spread
    // reads pr ~ dim; rank-4 spread reads pr ~ 4 with top_share ~ 1/4
    val rnd = new scala.util.Random(7)
    val iso = (0 until 400).map(k => (k.toLong,
      Array.fill(Dim)(rnd.nextGaussian().toFloat).toSeq, 0))
    val basis = Array.fill(4, Dim)(rnd.nextGaussian() / 8.0)
    val low = (0 until 400).map { k =>
      val z = Array.fill(4)(rnd.nextGaussian())
      val v = Array.tabulate(Dim)(i =>
        (0 until 4).map(j => basis(j)(i) * z(j) * 8.0).sum.toFloat)
      (k.toLong + 1000L, v.toSeq, 1)
    }
    val df = (iso ++ low).toDF("vec_id", "embedding", "label")
    val out = Similarity.clusterSpectrum(df, col("label"))
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(4), r.getDouble(5))).toMap
    val (prIso, topIso) = out(0)
    val (prLow, topLow) = out(1)
    assert(prIso > 30.0, s"isotropic pr $prIso should approach dim")
    assert(prLow < 8.0, s"rank-4 pr $prLow should approach 4")
    assert(topIso < 0.1, s"isotropic top share $topIso")
    assert(topLow > 0.15, s"rank-4 top share $topLow")
  }

  test("the JL-projected probe makes the same architecture call on " +
       "both regimes") {
    // the high-dim escape hatch's decision-preservation property,
    // pinned on the same constructed geometries: after projecting
    // 64 -> 16, isotropic spread fills the projected space
    // (pr ≈ outDim, the cap) while rank-4 spread stays ~4-dimensional —
    // the pr-vs-r_code comparison is unchanged. ScaleSmoke spectrumhd
    // measures the same property (and the >=5x cost cut) at dim=512.
    val outDim = 16
    val rnd = new scala.util.Random(7)
    val iso = (0 until 400).map(k => (k.toLong,
      Array.fill(Dim)(rnd.nextGaussian().toFloat).toSeq, 0))
    val basis = Array.fill(4, Dim)(rnd.nextGaussian() / 8.0)
    val low = (0 until 400).map { k =>
      val z = Array.fill(4)(rnd.nextGaussian())
      val v = Array.tabulate(Dim)(i =>
        (0 until 4).map(j => basis(j)(i) * z(j) * 8.0).sum.toFloat)
      (k.toLong + 1000L, v.toSeq, 1)
    }
    val df = (iso ++ low).toDF("vec_id", "embedding", "label")
    val out = Similarity
      .clusterSpectrumProjected(df, col("label"), Dim, outDim)
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    val prIso = out(0); val prLow = out(1)
    assert(prIso > 0.6 * outDim,
      s"projected isotropic pr $prIso should approach the outDim cap")
    assert(prLow < 8.0,
      s"projected rank-4 pr $prLow should stay ~4")
    // determinism: the fixed-seed projection reads identically twice
    val again = Similarity
      .clusterSpectrumProjected(df, col("label"), Dim, outDim)
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(again == out)
  }
}
