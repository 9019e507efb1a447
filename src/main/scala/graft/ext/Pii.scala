package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII scrubbing — the redaction pass a training-data pipeline runs
  * before anything leaves the ingest zone: find emails / phone numbers /
  * IPv4 addresses, replace each with a typed placeholder, and report
  * per-document match counts for the audit log.
  *
  * The synthetic corpus contains no PII, so the gate query first
  * *injects* deterministic PII derived from `doc_id` (an email always; a
  * phone, an IP, and a second email on modular subsets so the counts
  * vary 0–2 rather than being constant) — the DuckDB oracle builds the
  * identical augmented text and re-runs the identical regexes, so the
  * redaction logic (patterns, boundaries, replacement order) is what the
  * hash comparison actually pins down, not the injection.
  *
  * Scale: pure map-side regex work over the scan — no shuffle, no state,
  * throughput scales with executors. Patterns are ASCII-anchored and
  * RE2-compatible so engine regex dialects agree.
  */
object Pii {

  /** RE2- and java.util.regex-compatible patterns (no lookaround). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact in a fixed order (emails, then phones, then IPs) so later
    * patterns can never match inside an earlier placeholder. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  private def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Deterministic PII injection keyed on doc_id (see object doc). */
  private def augmented: Column = {
    val id = col("doc_id")
    concat(
      col("text"),
      lit(" contact u"), id.cast("string"), lit("@example.com"),
      when(id % 3 === 0,
        concat(lit(" tel 555-123-"),
               lpad((id % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(id % 5 === 0,
        concat(lit(" host 10.0."), (id % 256).cast("string"), lit(".7")))
        .otherwise(lit("")),
      when(id % 7 === 0,
        concat(lit(" alt a.b"), id.cast("string"),
               lit("@mail.example.org")))
        .otherwise(lit("")))
  }

  /** Per-document PII audit + redacted-content hash over the augmented
    * corpus: (doc_id, n_emails, n_phones, n_ips, redacted_hash). */
  def piiAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), augmented.as("aug"))
      .select(
        col("doc_id"),
        countMatches(col("aug"), emailRe).as("n_emails"),
        countMatches(col("aug"), phoneRe).as("n_phones"),
        countMatches(col("aug"), ipv4Re).as("n_ips"),
        md5(redact(col("aug"))).as("redacted_hash"))

  /** DuckDB oracle for [[piiAudit]] — identical injection, patterns,
    * and replacement order. */
  val piiAuditOracleSql: String =
    """WITH aug AS (
      |  SELECT doc_id,
      |    text || ' contact u' || CAST(doc_id AS VARCHAR)
      |      || '@example.com'
      |      || CASE WHEN doc_id % 3 = 0
      |           THEN ' tel 555-123-'
      |             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |           ELSE '' END
      |      || CASE WHEN doc_id % 5 = 0
      |           THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
      |             || '.7'
      |           ELSE '' END
      |      || CASE WHEN doc_id % 7 = 0
      |           THEN ' alt a.b' || CAST(doc_id AS VARCHAR)
      |             || '@mail.example.org'
      |           ELSE '' END AS a
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(a,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |    AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(a, '\b\d{3}-\d{3}-\d{4}\b'))
      |    AS BIGINT) AS n_phones,
      |  CAST(len(regexp_extract_all(a,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
      |  md5(regexp_replace(regexp_replace(regexp_replace(a,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
      |    'g'), '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'))
      |    AS redacted_hash
      |FROM aug""".stripMargin
}
