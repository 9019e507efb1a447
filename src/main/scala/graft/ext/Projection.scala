package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Johnson–Lindenstrauss random projection (64 → 16 dims) with a
  * norm-preservation audit — the dimensionality-reduction step a
  * pipeline runs before an ANN index when the embedding dim (and so
  * the index size and per-pair cost) is the bottleneck. JL lemma:
  * projecting onto k fixed Gaussian directions preserves squared
  * norms in expectation (E[‖Rx‖²/k] = ‖x‖²) with relative spread
  * ~√(2/k); the audit emits per-vector original and projected squared
  * norms plus their ratio, so the distortion distribution is the gate
  * output itself.
  *
  * Deterministic: the projection matrix is fixed-seed Gaussian (the
  * q31 hyperplane technique — literals in both engines), every dot
  * and sum-of-squares is a sequential left-associated double fold,
  * and the two final divisions are single IEEE ops. Pure map-side
  * expression work — at 100 TB this runs at scan speed and composes
  * with [[Quantize]]/[[Similarity]] downstream. */
object Projection {

  private val Dim = 64
  private val OutDim = 16

  /** Fixed-seed Gaussian JL matrix for arbitrary shapes — the q115
    * matrix generalized so other operators (the high-dim spectrum
    * probe, [[Similarity.clusterSpectrumProjected]]) can compose the
    * same projection at their own dimensions. Deterministic per
    * (inDim, outDim, seed). */
  private[ext] def jlMatrixFor(inDim: Int, outDim: Int,
                               seed: Long = 13): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(outDim, inDim)(rnd.nextGaussian())
  }

  private[ext] val jlMatrix: Array[Array[Double]] =
    jlMatrixFor(Dim, OutDim)

  private def dot(a: Column, lits: Array[Double]): Column =
    graft.functions.VectorOps.dot(a, typedlit(lits))

  def jlNormAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = col("embedding")
    val projSq = jlMatrix.map { row =>
      val d = dot(e, row); d * d
    }.reduce(_ + _)
    val origSq = graft.functions.VectorOps.dot(e, e)
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), origSq.as("orig_sq"), projSq.as("proj_sq"))
      .withColumn("ratio",
        col("proj_sq") / lit(OutDim.toDouble) / col("orig_sq"))
  }

  /** DuckDB oracle: literal matrix rows, the same sequential dots
    * (list_reduce with the 0.0 seed), the same left-associated
    * sum-of-squares, the same two divisions — bit-exact doubles. */
  def jlNormAuditOracleSql: String = {
    val rows = jlMatrix.map(r =>
      s"[${r.map(v => s"'$v'::DOUBLE").mkString(", ")}]")
    val dots = rows.zipWithIndex.map { case (r, k) =>
      s"""list_reduce([0.0] || [CAST(e.embedding[j] AS DOUBLE) * ($r)[j]
         |      for j in range(1, ${Dim + 1})], (a, t) -> a + t) AS d$k"""
        .stripMargin }
      .mkString(",\n    ")
    val projSq = (1 until OutDim)
      .foldLeft("d0 * d0")((acc, k) => s"($acc + d$k * d$k)")
    s"""WITH d AS (
       |  SELECT e.vec_id,
       |    list_reduce([0.0] || [CAST(e.embedding[j] AS DOUBLE) *
       |        CAST(e.embedding[j] AS DOUBLE)
       |      for j in range(1, ${Dim + 1})], (a, t) -> a + t) AS orig_sq,
       |    $dots
       |  FROM embeddings e)
       |SELECT vec_id, orig_sq, $projSq AS proj_sq,
       |  $projSq / ${OutDim.toDouble} / orig_sq AS ratio
       |FROM d""".stripMargin
  }
}
