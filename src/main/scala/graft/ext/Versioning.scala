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
    * spawns a brand-new doc at doc_id + 1000000. */
  private[ext] def v2(spark: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val kept = v1.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 13 === 1, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
    val added = v1.filter(col("doc_id") % 13 === 2)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
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
      |  SELECT doc_id + 1000000 AS doc_id, source,
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
}
