package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Token-window chunking — the step that turns a cleaned document corpus
  * into fixed-length training sequences. Each document is split into
  * overlapping windows of `seqLen` word tokens advanced by `stride`
  * (stride < seqLen ⇒ overlap, the usual LM packing pre-step); the final
  * window is clamped to the document tail rather than padded, and a
  * document shorter than one window still yields its single short chunk.
  *
  * Output per chunk: (doc_id, chunk_idx, start_tok, n_chunk_tokens,
  * chunk_hash) — the hash stands in for the chunk text so the gate hashes
  * stay small while still pinning the exact token content.
  *
  * Scale: pure map-side — tokenize (codegen'd NormalizeText + split),
  * compute the chunk count arithmetically, explode a `sequence()` of
  * chunk indices, slice the token array per index. No shuffle, no state;
  * output rows ≈ input tokens / stride, produced streaming per input
  * partition. The chunk-count formula is exact integer arithmetic
  * (ceil((len − seqLen)/stride) + 1) so the chunk set is engine-exact.
  */
object Chunking {

  def chunks(spark: SparkSession, dir: String,
             seqLen: Int = 32, stride: Int = 16): DataFrame =
    chunksOf(Tables.load(spark, dir, "documents"), seqLen, stride)

  /** Same operator over any (doc_id, text, ...) frame — the composable
    * form used by the end-to-end pipeline ([[Pipeline.cleanCorpus]]). */
  def chunksOf(documents: DataFrame,
               seqLen: Int = 32, stride: Int = 16): DataFrame = {
    require(seqLen > 0 && stride > 0, "seqLen and stride must be positive")
    documents
      .select(col("doc_id"),
              split(TextAnalysis.normalized(col("text")), " ").as("toks"))
      .filter(size(col("toks")) > 0 && col("toks").getItem(0) =!= "")
      .withColumn("n_chunks",
        when(size(col("toks")) <= seqLen, lit(1)).otherwise(
          // Column./ is true division; floor() of exact small ints
          // recovers the integer ceil-division
          floor((size(col("toks")) - seqLen + stride - 1) / stride)
            .cast("int") + 1))
      .select(col("doc_id"), col("toks"),
              explode(sequence(lit(0), col("n_chunks") - 1)).as("i"))
      .select(
        col("doc_id"),
        col("i").cast("long").as("chunk_idx"),
        (col("i") * stride + 1).cast("long").as("start_tok"),
        slice(col("toks"), col("i") * stride + 1, lit(seqLen)).as("chunk"))
      .select(
        col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_hash"))
  }

  /** DuckDB oracle for [[chunks]] — same normalization regexes, same
    * integer chunk-count formula, 1-based inclusive list slicing. */
  def chunksOracleSql(seqLen: Int = 32, stride: Int = 16): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(
       |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')
       |    AS ts
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, ts, len(ts) AS l,
       |    CASE WHEN len(ts) <= $seqLen THEN 1
       |         ELSE (len(ts) - $seqLen + $stride - 1) // $stride + 1
       |    END AS nc
       |  FROM toks WHERE len(ts) > 0 AND ts[1] <> '')
       |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       |  CAST(i * $stride + 1 AS BIGINT) AS start_tok,
       |  CAST(least(l - i * $stride, $seqLen) AS BIGINT)
       |    AS n_chunk_tokens,
       |  md5(array_to_string(
       |    ts[i * $stride + 1 : least(i * $stride + $seqLen, l)], ' '))
       |    AS chunk_hash
       |FROM (SELECT doc_id, ts, l,
       |        unnest(generate_series(0, nc - 1)) AS i
       |      FROM n)""".stripMargin
}
