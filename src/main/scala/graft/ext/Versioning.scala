package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dataset-version diff — the snapshot audit every managed training
  * corpus needs between refreshes ("what changed since v1?"): per
  * (source, status) counts of added / removed / changed / unchanged
  * documents, computed fingerprint-first.
  *
  * No reference counterpart (llamadb has no versioned storage); this is
  * the table-format-style history audit (Delta/Iceberg snapshot diff)
  * re-expressed as a pure two-snapshot relational plan.
  *
  * Scale: each side is projected to (doc_id, source, md5(text)) before
  * the join — the full-outer diff joins 16-byte fingerprints keyed on
  * doc_id (one co-partitioned shuffle), never the document bodies; the
  * output is bounded at sources × 4 statuses. At 100 TB this is the
  * standard two-pass "diff the manifests" cost, and with both snapshots
  * bucketed on doc_id the shuffle disappears entirely.
  */
object Versioning {

  /** Deterministic simulated v2 of the documents table (the gate needs
    * two snapshots; the perturbation is a pure function of doc_id so
    * the oracle replays it): doc_id % 13 == 0 → removed,
    * % 13 == 1 → text amended (changed), % 13 == 2 → additionally
    * spawns a brand-new doc at doc_id + max(doc_id) + 1. The offset is
    * the table's own broadcast max key (the Cdc.customerMerge
    * discipline), NOT a fixed constant — a fixed +1000000 collides with
    * live ids once the corpus exceeds 1M docs and silently corrupts the
    * added/changed classification. */
  private[ext] def v2(spark: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = v1.agg(max(col("doc_id")).as("mx_id"))
    val kept = v1.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 13 === 1, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
    val added = v1.filter(col("doc_id") % 13 === 2)
      .crossJoin(broadcast(maxId))
      .select((col("doc_id") + col("mx_id") + lit(1L)).as("doc_id"),
              col("source"),
              concat(lit("new in v2 #"), col("doc_id")).as("text"))
    kept.unionByName(added)
  }

  /** Gate: full-outer fingerprint diff of v1 vs the simulated v2 →
    * (source, status, n_docs, id_checksum). The checksum
    * (`sum(doc_id % 9973)`) makes the gate sensitive to WHICH docs got
    * each status, not just how many. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val fp1 = Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id1"), col("source").as("src1"),
              md5(col("text")).as("fp1"))
    val fp2 = v2(spark, dir)
      .select(col("doc_id").as("id2"), col("source").as("src2"),
              md5(col("text")).as("fp2"))
    fp1.join(fp2, col("id1") === col("id2"), "full_outer")
      .select(
        coalesce(col("src1"), col("src2")).as("source"),
        when(col("id1").isNull, "added")
          .when(col("id2").isNull, "removed")
          .when(col("fp1") === col("fp2"), "unchanged")
          .otherwise("changed").as("status"),
        coalesce(col("id1"), col("id2")).as("id"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("id") % 9973).as("id_checksum"))
  }

  def snapshotDiffOracleSql(): String =
    """WITH v2 AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 13 = 1 THEN text || ' [rev2]' ELSE text END
      |      AS text
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT doc_id + (SELECT max(doc_id) FROM documents) + 1
      |      AS doc_id, source,
      |    'new in v2 #' || CAST(doc_id AS VARCHAR) AS text
      |  FROM documents WHERE doc_id % 13 = 2),
      |diff AS (
      |  SELECT coalesce(a.source, b.source) AS source,
      |    CASE WHEN a.doc_id IS NULL THEN 'added'
      |         WHEN b.doc_id IS NULL THEN 'removed'
      |         WHEN md5(a.text) = md5(b.text) THEN 'unchanged'
      |         ELSE 'changed' END AS status,
      |    coalesce(a.doc_id, b.doc_id) AS id
      |  FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      |SELECT source, status, count(*) AS n_docs,
      |  CAST(sum(id % 9973) AS BIGINT) AS id_checksum
      |FROM diff GROUP BY source, status""".stripMargin

  /** Duplicate-discovery curve — the crawl-economics audit: as the
    * corpus grows (doc_id order ≈ ingest order), what fraction of each
    * ingest batch is an exact duplicate of anything EARLIER? A rising
    * curve says the crawl is exhausting its sources (diminishing novel
    * content) — the signal that decides when to stop collecting.
    *
    * A doc is a duplicate iff a smaller doc_id shares its normalized
    * fingerprint; batches are `batchSize`-wide doc_id ranges. Scale:
    * one fingerprint shuffle to min-per-fp (map-side combine), one
    * co-keyed join back, one bounded batch rollup — the q24 exact-dedup
    * cost with a curve on top. */
  def dupDiscoveryCurve(spark: SparkSession, dir: String,
                        batchSize: Int = 50): DataFrame = {
    val fps = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
              md5(TextAnalysis.normalized(col("text"))).as("fp"))
    val firsts = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("first_id"))
    fps.join(firsts, "fp")
      .select((col("doc_id") / batchSize).cast("long").as("batch"),
              when(col("doc_id") > col("first_id"), 1L).otherwise(0L)
                .as("is_dup"))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dups"),
           round(sum(col("is_dup")) / count(lit(1)).cast("double"), 4)
             .as("dup_rate"))
  }

  def dupDiscoveryCurveOracleSql(batchSize: Int = 50): String =
    s"""WITH fps AS (
       |  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(
       |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
       |  FROM documents),
       |flags AS (
       |  SELECT doc_id // $batchSize AS batch,
       |    CASE WHEN doc_id > min(doc_id) OVER (PARTITION BY fp)
       |         THEN 1 ELSE 0 END AS is_dup
       |  FROM fps)
       |SELECT batch, count(*) AS n_docs,
       |  CAST(sum(is_dup) AS BIGINT) AS n_dups,
       |  round(sum(is_dup) / CAST(count(*) AS DOUBLE), 4) AS dup_rate
       |FROM flags GROUP BY batch""".stripMargin
}
