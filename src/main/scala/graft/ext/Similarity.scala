package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (vec_id, embedding array<float>, label).
  *
  * Two paths:
  *   - brute-force cosine top-k: the exact baseline. Query set broadcast
  *     against the corpus — one scan of the corpus per batch of queries,
  *     no corpus self-join. Correct at any corpus size; cost linear in
  *     |corpus| x |queries|.
  *   - sign-LSH (random hyperplanes) bucketing: the scale path. Corpus
  *     bucketed once by sign pattern; queries probe only their bucket.
  *     Shuffle keyed on bucket id; recall tuned by plane count.
  *
  * Cosine is a sequential left-to-right double accumulation (codegen'd
  * VectorOps kernel) — deterministic across runs. Oracle comparisons use
  * ranks or 4-decimal-rounded values only: engines' cosine kernels agree
  * to ~1e-8 while top-k sim gaps are ~1e-4 (validated empirically), so
  * rankings cannot flip.
  */
object Similarity {

  /** Cosine similarity of two array<float> columns, computed in double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))

  /** Sequential double dot product of two array columns — the codegen'd
    * [[graft.functions.VectorOps.DotProduct]] kernel (the HOF
    * aggregate-over-zip_with it replaces is evaluated interpreted,
    * per-element, and dominated every per-pair similarity stage). */
  def dot(x: Column, y: Column): Column = graft.functions.VectorOps.dot(x, y)

  /** L2-normalized double copy of an embedding column. Pre-normalizing
    * each side once before a pair join turns per-pair cosine (three array
    * folds) into a single dot product — the folds run per ROW, not per
    * PAIR. */
  def l2normalize(emb: Column): Column =
    graft.functions.VectorOps.l2normalize(emb)

  /** Brute-force cosine top-k: for each query vector (vec_id < nQueries),
    * rank the whole corpus (self excluded). The query side is broadcast;
    * the corpus is scanned once. Output: (qid, nid, rank). */
  def bruteForceTopK(spark: SparkSession, dir: String,
                     nQueries: Int = 5, k: Int = 10): DataFrame = {
    val corpus = Tables.load(spark, dir, "embeddings")
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), l2normalize(col("embedding")).as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    corpus.select(col("vec_id").as("nid"), l2normalize(col("embedding")).as("ne"))
      .join(broadcast(queries), col("qid") =!= col("nid"))
      .withColumn("sim", dot(col("qe"), col("ne")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"))
  }

  // ---- sign-LSH (random hyperplane) bucketing -----------------------

  /** Fixed random hyperplanes (deterministic seed): NumPlanes x dim
    * coefficients. 8 planes → 256 buckets; tune for corpus size (at
    * 100 TB, more planes + multi-probe). */
  private val NumPlanes = 8
  private val Dim = 64
  private[ext] val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(NumPlanes, Dim)(rnd.nextGaussian())
  }

  /** Bucket id = sign pattern of the vector against the hyperplanes.
    * Pure expression work (no UDF): codegen'd dot products against
    * array literals. */
  def withBuckets(df: DataFrame, emb: Column): DataFrame = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeArr = array(p.map(lit): _*)
      val d = dot(emb, planeArr)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    df.withColumn("bucket", bits.reduce(_ + _))
  }

  // ---- IVF (coarse quantizer + multi-probe) -------------------------

  /** Deterministic coarse centroids: the first `k` corpus vectors by
    * vec_id, L2-normalized. A production index trains k-means here; the
    * IVF *structure* — bounded centroid table on the driver, map-side
    * cell assignment, multi-probe search — is identical either way and
    * is what matters at scale (the centroid table is K x dim doubles,
    * bounded regardless of corpus size). */
  private[ext] def centroids(corpus: DataFrame, k: Int): Array[Array[Double]] =
    corpus.orderBy(col("vec_id")).limit(k)
      .select(l2normalize(col("embedding")).as("c")).collect()
      .map(_.getSeq[Double](0).toArray)

  /** Cell id = argmax-dot centroid (map-side; ties → lowest index). */
  private[ext] def withIvfCells(df: DataFrame, emb: Column,
                                cents: Array[Array[Double]]): DataFrame = {
    val dots = array(cents.map(c =>
      dot(l2normalize(emb), array(c.map(lit): _*))): _*)
    df.withColumn("__d", dots)
      .withColumn("cell",
        expr("array_position(__d, array_max(__d))").cast("int") - 1)
      .drop("__d")
  }

  /** IVF ANN top-k: corpus vectors live in their nearest-centroid cell;
    * each query probes its `nProbe` nearest cells only. Shuffle keyed on
    * cell id; recall tuned by nProbe (and centroid count) — the standard
    * IVF trade. Output shape matches bruteForceTopK. */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 5,
              k: Int = 10, numCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val corpus = Tables.load(spark, dir, "embeddings")
    val cents = centroids(corpus, numCells)
    val corpusCells = withIvfCells(corpus, col("embedding"), cents)
      .select(col("vec_id").as("nid"), l2normalize(col("embedding")).as("ne"),
              col("cell"))
    // per query: dots to every centroid, take the nProbe best cells.
    // (HOF sort is interpreted but runs on the bounded query batch only.)
    val qDots = array(cents.map(c =>
      dot(l2normalize(col("embedding")), array(c.map(lit): _*))): _*)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), l2normalize(col("embedding")).as("qe"),
              qDots.as("__d"))
      .select(col("qid"), col("qe"), explode(expr(
        s"""slice(transform(
           |  array_sort(
           |    transform(sequence(0, ${cents.length - 1}),
           |      i -> named_struct('d', element_at(__d, i + 1), 'idx', i)),
           |    (l, r) -> CASE WHEN l.d > r.d THEN -1
           |                   WHEN l.d < r.d THEN 1
           |                   WHEN l.idx < r.idx THEN -1 ELSE 1 END),
           |  s -> s.idx), 1, $nProbe)""".stripMargin)).as("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    corpusCells.join(broadcast(queries),
        corpusCells("cell") === queries("cell") && col("qid") =!= col("nid"))
      .withColumn("sim", dot(col("qe"), col("ne")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"))
  }

  /** LSH ANN top-k: queries probe only their own bucket. Same output
    * shape as bruteForceTopK; recall < 1 by design (spec-tested). */
  def lshTopK(spark: SparkSession, dir: String,
              nQueries: Int = 5, k: Int = 10): DataFrame = {
    val corpus = withBuckets(
      Tables.load(spark, dir, "embeddings"), col("embedding"))
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), l2normalize(col("embedding")).as("qe"),
              col("bucket").as("qb"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    corpus.select(col("vec_id").as("nid"), l2normalize(col("embedding")).as("ne"),
                  col("bucket"))
      .join(broadcast(queries),
            col("qb") === col("bucket") && col("qid") =!= col("nid"))
      .withColumn("sim", dot(col("qe"), col("ne")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"))
  }
}
