package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: code bounds, determinism, and the training
  * guarantee — a trained 16-entry codebook per subspace must reconstruct
  * strictly better than the 1-centroid (subspace-mean) baseline. */
class PqSpec extends SparkSpec {

  test("codes are M-length, in [0, 16), and errors non-negative") {
    val out = Quantize.pqCodes(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(size(col("codes")) =!= 4).count() == 0)
    assert(out.filter(exists(col("codes"),
      c => c < 0 || c >= 16)).count() == 0)
    assert(out.filter(col("sq_err") < 0).count() == 0)
    out.unpersist()
  }

  test("encoding is deterministic across runs") {
    Quantize.clearMemos()
    val a = Quantize.pqCodes(spark, sfDir).collect().map(_.toString).sorted
    Quantize.clearMemos()
    val b = Quantize.pqCodes(spark, sfDir).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("trained codebooks beat the 1-centroid-per-subspace baseline") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = 64
    val trained = Quantize.pqTrain(embs, dim)
    // baseline: one centroid per subspace = the subspace mean
    val meanVec = embs
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(avg(col("v")).as("m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    val sub = dim / 4
    val baseline = Array.tabulate(4)(m =>
      Array(meanVec.slice(m * sub, (m + 1) * sub)))
    def meanErr(books: Array[Array[Array[Double]]]): Double =
      Quantize.pqCodesDf(embs, dim, books)
        .agg(avg(col("sq_err"))).head.getDouble(0)
    val e16 = meanErr(trained)
    val e1 = meanErr(baseline)
    assert(e16 < e1,
      s"16-entry codebooks must beat the subspace mean: $e16 vs $e1")
  }
}
