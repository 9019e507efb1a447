package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CdcBoundaries

/** Content-defined-chunking dedup over the `documents` table — the
  * rsync/LBFS/FastCDC family: split each document at rolling-hash-chosen
  * boundaries (see [[graft.functions.CdcBoundaries]]), hash each chunk,
  * and measure how much of every document is duplicated elsewhere in the
  * corpus at CHUNK granularity. Whole-document hashing (q24/q25) only
  * catches exact copies; shingle/minhash (q26–q28) scores set overlap;
  * chunk dedup localizes WHERE the shared spans are and is the basis of
  * delta-storage and partial-overlap removal in large corpora.
  *
  * Scale shape (100 TB read): boundary discovery is a one-pass codegen'd
  * rolling hash per document (map-side, no state); chunk extraction is a
  * per-row array transform; the dedup itself is ONE shuffle keyed on the
  * chunk md5 (vocabulary-of-chunks bounded) plus one doc_id-keyed
  * aggregation for the per-document rollup. No self-joins, no driver
  * state.
  */
object CdcChunk {
  /** Default window / cut-divisor: expected chunk length ≈ divisor
    * bytes on random content; small enough that the sf0.001 docs split
    * into several chunks. */
  val Window = 16
  val Divisor = 64

  /** Per-document chunk instances: (doc_id, pos, chunk, h). Boundaries
    * that coincide with the text end are not doubled; documents shorter
    * than the window yield one whole-text chunk; empty normalized text
    * yields none. */
  def chunks(spark: SparkSession, dir: String,
             w: Int = Window, divisor: Int = Divisor): DataFrame =
    chunksOf(Tables.load(spark, dir, "documents"), w, divisor)

  private[ext] def chunksOf(docs: DataFrame, w: Int, divisor: Int): DataFrame =
    docs
      .select(col("doc_id"),
              TextAnalysis.normalized(col("text")).as("nt"))
      .withColumn("bs", CdcBoundaries.cdcBoundaries(col("nt"), w, divisor))
      // bounds = 0 ++ boundaries ++ text end (unless the last boundary
      // already IS the end — avoid an empty trailing chunk)
      .withColumn("bnds", expr(
        """CASE WHEN size(bs) > 0 AND element_at(bs, -1) = length(nt)
          |     THEN concat(array(0), bs)
          |     ELSE concat(array(0), bs, array(length(nt))) END"""
          .stripMargin))
      .select(col("doc_id"), col("nt"), explode(expr(
        """transform(sequence(1, size(bnds) - 1),
          |  i -> struct(bnds[i - 1] + 1 AS pos,
          |              substring(nt, bnds[i - 1] + 1,
          |                        bnds[i] - bnds[i - 1]) AS chunk))"""
          .stripMargin)).as("c"))
      .select(col("doc_id"), col("c.pos").as("pos"), col("c.chunk").as("chunk"))
      .filter(col("chunk") =!= "")
      .withColumn("h", md5(col("chunk")))

  /** Per-document chunk-dedup rollup: how many of the document's chunks
    * also occur in at least one OTHER document. Output:
    * (doc_id, n_chunks, n_dup, dup_ratio[4dp]). */
  def chunkDedupStats(spark: SparkSession, dir: String,
                      w: Int = Window, divisor: Int = Divisor): DataFrame = {
    val ch = chunks(spark, dir, w, divisor)
    val docsPerChunk = ch.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    ch.join(docsPerChunk, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
           sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup"),
              round(col("n_dup") / col("n_chunks"), 4).as("dup_ratio"))
  }

  /** DuckDB oracle: replays the boundary rule as a per-window integer
    * fold (algebraically identical to the engine's rolling update — both
    * are the Karp–Rabin residue mod 1e9+7), then the same chunk md5
    * rollup. Integer-exact except the final ratio (exact division of two
    * small ints, 4dp-rounded on both sides). */
  def chunkDedupStatsOracleSql(w: Int = Window,
                               divisor: Int = Divisor): String =
    s"""WITH norm AS (
       |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
       |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, nt,
       |    [CAST(i AS INT) for i in range($w, length(nt) + 1)
       |     if list_reduce([0] ||
       |          [CAST(unicode(substr(nt, CAST(i AS INT) - $w + j, 1)) AS BIGINT)
       |           for j in range(1, $w + 1)],
       |          (a, c) -> (a * ${CdcBoundaries.Base} + c)
       |                    % ${CdcBoundaries.Mod}) % $divisor = 0] AS bs
       |  FROM norm),
       |b2 AS (
       |  SELECT doc_id, nt,
       |    CASE WHEN len(bs) > 0 AND bs[-1] = length(nt)
       |         THEN [0] || bs ELSE [0] || bs || [length(nt)] END AS bnds
       |  FROM b),
       |c AS (
       |  SELECT doc_id,
       |    unnest([substr(nt, bnds[i] + 1, bnds[i + 1] - bnds[i])
       |            for i in range(1, len(bnds))]) AS chunk
       |  FROM b2),
       |h AS (SELECT doc_id, md5(chunk) AS h FROM c WHERE chunk <> ''),
       |d AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM h GROUP BY h)
       |SELECT doc_id, count(*) AS n_chunks,
       |  CAST(sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup,
       |  round(CAST(sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |        / count(*), 4) AS dup_ratio
       |FROM h JOIN d USING (h)
       |GROUP BY doc_id""".stripMargin
}
