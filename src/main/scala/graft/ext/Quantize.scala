package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding quantization for vector-store export — the compression step
  * between an embedding pipeline and an ANN index: symmetric per-vector
  * int8 (max-abs) scalar quantization, the scheme FAISS calls SQ8 and
  * most vector databases default to.
  *
  * Per vector: `scale = max|x| / 127`, `code_i = ⌊x_i·127/max|x| + ½⌋`
  * (symmetric round-half-toward-+∞ — written as floor(+0.5) because
  * `round()` semantics differ across engines while `floor` is exact).
  * The gate emits per-vector code stats (sum / min / max — exact
  * integers) and the max absolute dequantization error, from an
  * IEEE-deterministic double tree mirrored verbatim in the oracle.
  *
  * Scale: pure per-row expression work over the array column inside one
  * projection — no shuffle, no UDF; at 100 TB this runs at scan speed
  * and composes map-side with any upstream (e.g. after [[Dedup]]
  * survivors, before an [[Similarity]] index build). Zero vectors —
  * and empty ones, whose max-abs is NULL — quantize to all-zero codes
  * with zero error rather than NaN (the empty-array guard matters:
  * Spark's `aggregate` over an empty array returns the seed while
  * DuckDB's `list_aggregate` returns NULL, so an unguarded empty
  * vector would diverge between the engines). */
object Quantize {

  private def xd(x: Column): Column = x.cast("double")

  /** Per-vector int8 quantization audit over `embeddings`. */
  def int8Stats(spark: SparkSession, dir: String): DataFrame =
    int8StatsDf(Tables.load(spark, dir, "embeddings"))

  /** Same operator over any (vec_id, embedding: array&lt;float&gt;) frame. */
  def int8StatsDf(embeddings: DataFrame): DataFrame = {
    val code = (x: Column) =>
      floor(xd(x) * lit(127.0) / col("amax") + lit(0.5)).cast("long")
    val dequantErr = (x: Column) =>
      abs(xd(x) - (code(x).cast("double") * col("amax")) / lit(127.0))
    embeddings
      .select(col("vec_id"), col("embedding"),
              array_max(transform(col("embedding"), x => abs(xd(x))))
                .as("amax"))
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        when(col("amax").isNull || col("amax") === 0.0, lit(0L))
          .otherwise(aggregate(
            transform(col("embedding"), x => code(x)),
            lit(0L), (acc, c) => acc + c)).as("sum_code"),
        when(col("amax").isNull || col("amax") === 0.0, lit(0L))
          .otherwise(array_max(transform(col("embedding"), x => code(x))))
          .as("max_code"),
        when(col("amax").isNull || col("amax") === 0.0, lit(0L))
          .otherwise(array_min(transform(col("embedding"), x => code(x))))
          .as("min_code"),
        when(col("amax").isNull || col("amax") === 0.0, lit(0.0))
          .otherwise(
            array_max(transform(col("embedding"), x => dequantErr(x)))
              .cast("decimal(18,12)").cast("double")).as("max_abs_err"))
  }

  val int8StatsOracleSql: String =
    """WITH a AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
      |      AS amax
      |  FROM embeddings)
      |SELECT vec_id,
      |  CAST(len(embedding) AS BIGINT) AS n_dims,
      |  CASE WHEN coalesce(amax, 0) = 0 THEN 0 ELSE
      |    CAST(list_aggregate(list_transform(embedding, x ->
      |      CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT)),
      |      'sum') AS BIGINT) END AS sum_code,
      |  CASE WHEN coalesce(amax, 0) = 0 THEN 0 ELSE
      |    CAST(list_max(list_transform(embedding, x ->
      |      CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT)))
      |      AS BIGINT) END AS max_code,
      |  CASE WHEN coalesce(amax, 0) = 0 THEN 0 ELSE
      |    CAST(list_min(list_transform(embedding, x ->
      |      CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT)))
      |      AS BIGINT) END AS min_code,
      |  CASE WHEN coalesce(amax, 0) = 0 THEN 0.0 ELSE
      |    CAST(CAST(list_max(list_transform(embedding, x ->
      |      abs(CAST(x AS DOUBLE)
      |          - (CAST(CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5)
      |                 AS BIGINT) AS DOUBLE) * amax) / 127.0)))
      |      AS DECIMAL(18,12)) AS DOUBLE) END AS max_abs_err
      |FROM a""".stripMargin
}
