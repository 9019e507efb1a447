package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact-substring duplication audit (the Lee et al., ACL'22
  * "Deduplicating Training Data Makes Language Models Better" ExactSubstr
  * signal, at word-k-gram granularity): for every position in a document,
  * does the k-token window starting there also occur in ANOTHER document?
  *
  * Unlike [[TextAnalysis.gramNoveltyDf]] (distinct-gram novelty — how
  * much of the doc's VOCABULARY of grams is shared), this measures
  * positional COVERAGE — how much of the doc's TEXT is duplicated text —
  * and the length of the longest duplicated run, which is ExactSubstr's
  * actual detection target (a run of r consecutive duplicated k-windows
  * certifies a duplicated substring of r + k − 1 tokens).
  *
  * Scale: one positional-gram explode (md5 hex, the winnowing basis), a
  * gram-keyed document-frequency aggregate over DISTINCT (doc, gram)
  * rows, a join-back, and per-DOC windows (arrival-bounded, never
  * corpus-bounded) for the run analysis — the q84 TF-IDF shuffle shape
  * plus a doc-local window; everything linear in corpus size. */
object SubstrDup {

  /** Per-doc substring-duplication stats over `documents`: total
    * k-windows, duplicated windows (window occurs in ≥1 other doc),
    * positional duplication fraction, and the longest duplicated run in
    * TOKENS (0 when nothing is duplicated). */
  def substrDupStats(spark: SparkSession, dir: String,
                     k: Int = 8): DataFrame =
    substrDupStatsDf(Tables.load(spark, dir, "documents"), k,
      // the positional gram table is ~5× the parquet text bytes (16-hex
      // gram per token position + pos + doc_id, uncompressed in flight)
      // and is shuffled twice (distinct, gram join) — size those
      // exchanges from the input, not the session conf (the q28 lesson:
      // a fixed count turns the 100× run into a spill benchmark)
      Some(graft.ops.Partitioning.forTable(spark, dir, "documents", 5.0)))

  /** The q89 detection basis shared by the audit and the removal
    * rewrite (q216): per WINDOW-START position, is the k-window at
    * that position duplicated in another doc? Output (doc_id, pos,
    * dup). */
  private[ext] def dupWindows(docs: DataFrame, k: Int,
                              numParts: Option[Int]): DataFrame = {
    val gh0 = Winnow.gramHashesOf(docs.select(col("doc_id"), col("text")), k)
    // explicit gram-keyed repartition (not a conf scope: the gate's
    // action runs outside any scope, so the declared plan must carry
    // the derived count itself); hash(gh) satisfies the join's and the
    // distinct's downstream distribution on the gram side
    val gh = numParts.fold(gh0)(n => gh0.repartition(n, col("gh")))
    // document frequency of each gram VALUE (distinct docs containing it)
    val gdf = gh.select(col("doc_id"), col("gh")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("gdf"))
    gh.join(gdf, "gh")
      .select(col("doc_id"), col("pos"), (col("gdf") >= 2).as("dup"))
  }

  def substrDupStatsDf(docs: DataFrame, k: Int = 8,
                       numParts: Option[Int] = None): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val marked = dupWindows(docs, k, numParts)
      // run id for consecutive dup positions: the count of NON-dup
      // positions at-or-before pos is constant exactly across a dup run
      .withColumn("run_id",
        sum(when(col("dup"), 0L).otherwise(1L)).over(byPos))
    // r16 (guide §2.4): the stats and the longest-run reduction both
    // consumed `marked`, so the gram join + positional window ran
    // TWICE and a doc-keyed join glued the halves. One (doc, run_id)
    // aggregate now carries both: a run group holds its dup rows plus
    // at most the one non-dup row that opened it, so sum(dup) is the
    // run length and the per-doc rollup folds totals and max together.
    // Both aggregates ride the window's doc_id partitioning — no new
    // exchange.
    marked
      .groupBy(col("doc_id"), col("run_id"))
      .agg(count(lit(1)).as("nw"),
           sum(when(col("dup"), 1L).otherwise(0L)).as("nd"))
      .groupBy(col("doc_id"))
      .agg(sum(col("nw")).as("n_windows"),
           sum(col("nd")).as("n_dup_windows"),
           max(col("nd")).as("max_run"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        (col("n_dup_windows").cast("double") /
          col("n_windows").cast("double")).as("dup_fraction"),
        when(col("max_run") > 0, col("max_run") + lit(k - 1))
          .otherwise(lit(0L)).as("max_dup_run_tokens"))
  }

  /** Shared oracle detection CTEs (ws → gh0 → gh → gdf) — the SQL twin
    * of [[dupWindows]], used verbatim by both the audit and the
    * removal oracles. */
  private def gramCtes(k: Int): String =
    s"""ws AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(
       |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')
       |    AS w FROM documents),
       |gh0 AS (
       |  SELECT doc_id, unnest([{'pos': i - 1,
       |    'gh': substr(md5(array_to_string(w[i:i+${k - 1}], ' ')), 1, 16)}
       |    for i in range(1, len(w) - ${k - 2})]) AS u
       |  FROM ws WHERE len(w) >= $k),
       |gh AS (SELECT doc_id, u.pos AS pos, u.gh AS gh FROM gh0),
       |gdf AS (SELECT gh, count(*) AS gdf
       |        FROM (SELECT DISTINCT doc_id, gh FROM gh) GROUP BY gh)""".stripMargin

  /** DuckDB oracle: the same positional pipeline, value-for-value (the
    * gram basis is the q83 md5-hex form, engine-exact by construction). */
  def substrDupStatsOracleSql(k: Int = 8): String =
    s"""WITH ${gramCtes(k)},
       |marked AS (
       |  SELECT gh.doc_id, gh.pos, gdf.gdf >= 2 AS dup,
       |    sum(CASE WHEN gdf.gdf >= 2 THEN 0 ELSE 1 END)
       |      OVER (PARTITION BY gh.doc_id ORDER BY gh.pos) AS run_id
       |  FROM gh JOIN gdf USING (gh)),
       |runs AS (
       |  SELECT doc_id, max(run_len) AS max_run FROM (
       |    SELECT doc_id, run_id, count(*) AS run_len
       |    FROM marked WHERE dup GROUP BY doc_id, run_id)
       |  GROUP BY doc_id),
       |stats AS (
       |  SELECT doc_id, count(*) AS n_windows,
       |    CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dup_windows
       |  FROM marked GROUP BY doc_id)
       |SELECT s.doc_id, s.n_windows, s.n_dup_windows,
       |  CAST(s.n_dup_windows AS DOUBLE) / CAST(s.n_windows AS DOUBLE)
       |    AS dup_fraction,
       |  CAST(coalesce(r.max_run + ${k - 1}, 0) AS BIGINT)
       |    AS max_dup_run_tokens
       |FROM stats s LEFT JOIN runs r USING (doc_id)""".stripMargin

  /** Exact-substring duplication REMOVAL — the enactment of the q89
    * audit (Lee et al. ACL'22 §4.2 apply it as a rewrite, not just a
    * report): every token covered by at least one cross-doc-duplicated
    * k-window is deleted from the document's (normalized) token stream,
    * and the survivors are re-joined in order. Because a duplicated
    * window covers exactly k consecutive tokens, the shortest removable
    * span is k tokens — this is the reference method at word-k-gram
    * granularity instead of suffix-array 50-byte granularity (the
    * deviation is documented in DEVIATIONS.md; the detection basis is
    * identical to q89's, so audit and rewrite cannot disagree).
    *
    * Output: one row per document — token count, removed-token count,
    * and the cleaned text ('' when everything was duplicated; the full
    * normalized text when nothing was). Docs shorter than k tokens have
    * no windows and pass through unchanged.
    *
    * Scale: the q89 TF-IDF shuffle shape (positional-gram explode,
    * distinct-doc document frequency, gram-keyed join-back) plus one
    * doc-keyed position join and doc-local windows — everything linear
    * in corpus size; the coverage window frame is k rows, never
    * corpus-bounded, and the rebuild aggregate is arrival-bounded per
    * doc. */
  def substrRemove(spark: SparkSession, dir: String,
                   k: Int = 8): DataFrame =
    substrRemoveDf(Tables.load(spark, dir, "documents"), k,
      Some(graft.ops.Partitioning.forTable(spark, dir, "documents", 5.0)))

  def substrRemoveDf(docs: DataFrame, k: Int = 8,
                     numParts: Option[Int] = None): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    // token stream (same normalization basis as the gram hashes, so
    // positions line up by construction)
    val toks = base
      .select(col("doc_id"),
              split(TextAnalysis.normalized(col("text")), " ").as("ws"))
      .filter(size(col("ws")) > 0 && col("ws").getItem(0) =!= "")
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "tok")))
    // dup flag per WINDOW-START position (the shared q89 basis); token
    // positions past n-k get no row and join as null (no window starts
    // there)
    val dupw = dupWindows(base, k, numParts)
      .withColumnRenamed("dup", "win_dup")
    // token at pos p is covered iff a dup window starts in [p-k+1, p];
    // toks is dense in pos, so a k-row frame IS that position range
    val covFrame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(k - 1), 0)
    val covered = toks.join(dupw, Seq("doc_id", "pos"), "left")
      .withColumn("covered",
        max(when(coalesce(col("win_dup"), lit(false)), 1).otherwise(0))
          .over(covFrame) === 1)
    // r16 (guide §2.4): the stats and the rebuild were two separate
    // aggregations over `covered`, so the token join + coverage window
    // ran TWICE and two doc-keyed joins reassembled the output. One
    // aggregate now carries all three columns — collect_list skips the
    // NULLs the `when` leaves on covered tokens, which is exactly the
    // old `filter(!covered)`; a fully-covered doc yields an empty list
    // and joins '' like before. The aggregate rides the window's
    // doc_id partitioning — no new exchange.
    val stats = covered.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           sum(when(col("covered"), 1L).otherwise(0L)).as("n_removed"),
           array_join(expr("transform(array_sort(" +
             "collect_list(CASE WHEN NOT covered " +
             "THEN struct(pos, tok) END)), x -> x.tok)"), " ")
             .as("ct"))
    base.select(col("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
              coalesce(col("n_removed"), lit(0L)).as("n_removed"),
              coalesce(col("ct"), lit("")).as("clean_text"))
  }

  /** DuckDB oracle for [[substrRemove]]: the q89 detection CTEs plus
    * the k-row coverage window and an ordered string_agg rebuild. */
  def substrRemoveOracleSql(k: Int = 8): String =
    s"""WITH ${gramCtes(k)},
       |toks AS (
       |  SELECT doc_id, unnest([{'pos': i - 1, 'tok': w[i]}
       |    for i in range(1, len(w) + 1)]) AS u
       |  FROM ws WHERE len(w) > 0 AND w[1] <> ''),
       |tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM toks),
       |dupw AS (
       |  SELECT gh.doc_id, gh.pos, gdf.gdf >= 2 AS win_dup
       |  FROM gh JOIN gdf USING (gh)),
       |cov AS (
       |  SELECT t.doc_id, t.pos, t.tok,
       |    max(CASE WHEN coalesce(d.win_dup, false) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY t.doc_id ORDER BY t.pos
       |            ROWS BETWEEN ${k - 1} PRECEDING AND CURRENT ROW) = 1
       |      AS covered
       |  FROM tok t LEFT JOIN dupw d
       |    ON t.doc_id = d.doc_id AND t.pos = d.pos),
       |stats AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |    CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_removed
       |  FROM cov GROUP BY doc_id),
       |clean AS (
       |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS ct
       |  FROM cov WHERE NOT covered GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(s.n_removed, 0) AS BIGINT) AS n_removed,
       |  coalesce(c.ct, '') AS clean_text
       |FROM documents d
       |LEFT JOIN stats s ON d.doc_id = s.doc_id
       |LEFT JOIN clean c ON d.doc_id = c.doc_id""".stripMargin
}
