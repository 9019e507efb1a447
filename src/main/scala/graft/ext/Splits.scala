package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus partitioning operators for training pipelines: deterministic
  * train/val/test splits and incremental (new-batch-vs-existing) dedup.
  *
  * Both are scale-shaped from the start: the split is a pure per-row
  * expression (scan speed, no shuffle, stable under any repartitioning —
  * the assignment depends only on the row's key, never on row order or
  * partition layout, so re-running on a re-sharded 100 TB corpus yields
  * the identical split), and incremental dedup is the daily-crawl-append
  * pattern — one fingerprint shuffle over the NEW batch plus an
  * anti-join against the existing corpus's fingerprints (which at
  * production scale is a precomputed bucketed table, not a rescan).
  */
object Splits {

  /** Deterministic hash split: md5 of the salted doc key → first hex
    * char buckets 13/16 train, 1/16 val, 2/16 test. Salting the key
    * (rather than hashing the bare id) decorrelates the split from any
    * other id-derived assignment in the pipeline. */
  def hashSplit(spark: SparkSession, dir: String,
                salt: String = "graft"): DataFrame = {
    val hexc = substring(
      md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 1)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
              when(hexc <= "c", "train")
                .when(hexc === "d", "val")
                .otherwise("test").as("split"))
  }

  def hashSplitOracleSql(salt: String = "graft"): String =
    s"""SELECT doc_id, source,
       |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':$salt'), 1, 1)
       |            <= 'c' THEN 'train'
       |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':$salt'), 1, 1)
       |            = 'd' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin

  /** EXACT stratified split — the companion of [[hashSplit]] for the
    * case where proportions must hold EXACTLY per source (small eval
    * sets: a 1/16-hash split of a 200-doc source can miss its val
    * share by several docs; this one is off by at most the ⌈⌉ of the
    * cut). Docs rank within their source by (md5(doc_id), doc_id) —
    * a deterministic shuffle order — and the rank cuts at
    * ⌈trainPct·n/100⌉ / ⌈(trainPct+valPct)·n/100⌉.
    *
    * Scale: the rank is HIERARCHICAL (the q64/q126 discipline): docs
    * bucket by the top 8 bits of their own key (so (bucket, key) order
    * IS key order), per-(source, bucket) bases come from a bounded
    * 256-rows-per-source table, and the intra-bucket row_number
    * windows over ~n/256 rows — no task ever windows a whole source.
    * Assignment is a pure function of (doc_id, source composition):
    * identical on any partitioning, replayed by the oracle's plain
    * single-window rank. */
  def stratifiedSplit(spark: SparkSession, dir: String,
                      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
            "percentages must satisfy 0 < train, 0 <= val, train+val < 100")
    import org.apache.spark.sql.expressions.Window
    val hex = md5(col("doc_id").cast("string"))
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
              substring(hex, 1, 2).as("b"),
              conv(substring(hex, 1, 15), 16, 10).cast("long").as("k"))
    val bases = docs.groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("bc"))
      .withColumn("base", coalesce(sum(col("bc")).over(
        Window.partitionBy(col("source")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("b"), col("base"))
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    docs.join(broadcast(bases), Seq("source", "b"))
      .withColumn("r", col("base") +
        row_number().over(Window.partitionBy(col("source"), col("b"))
          .orderBy(col("k"), col("doc_id"))).cast("long") - 1L)
      .join(broadcast(totals), "source")
      .select(col("doc_id"), col("source"),
        when(col("r") * 100 < col("n") * trainPct, "train")
          .when(col("r") * 100 < col("n") * (trainPct + valPct), "val")
          .otherwise("test").as("split"))
  }

  /** DuckDB oracle for [[stratifiedSplit]]: the plain single-window
    * per-source rank over the same md5 key, same integer cuts. */
  def stratifiedSplitOracleSql(trainPct: Int = 80,
                               valPct: Int = 10): String =
    s"""WITH k AS (
       |  SELECT doc_id, source,
       |    list_reduce([CAST(strpos('0123456789abcdef', substr(
       |        md5(CAST(doc_id AS VARCHAR)), p, 1)) - 1
       |      AS BIGINT) for p in range(1, 16)],
       |      (a, b) -> a * 16 + b) AS k
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY k, doc_id) - 1
       |      AS r,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM k)
       |SELECT doc_id, source,
       |  CASE WHEN r * 100 < n * $trainPct THEN 'train'
       |       WHEN r * 100 < n * ${trainPct + valPct} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM r""".stripMargin

  /** Deterministic global shuffle + sharding — the delivery step of a
    * training pipeline: order the corpus by a seeded hash (reproducible,
    * uncorrelated with crawl/source order), assign each doc to one of
    * `nShards` shards, and number its position within the shard. The
    * gate emits per-shard counts plus an order-sensitive checksum
    * (`sum(pos · (doc_id % 1000))`), so any wrong shard assignment OR
    * any wrong within-shard position flips a value — the oracle replays
    * the md5-derived key exactly (15-hex-char fold, the q81/q98 trick)
    * and recomputes positions with SQL `row_number`.
    *
    * Scale: one shuffle keyed on shard; within-shard numbering is a
    * sorted streaming window (sort spills, row_number never materializes
    * the partition). Production shard counts keep shards executor-sized
    * (100 TB / 100k shards = 1 GB), which also bounds the window sort;
    * parallelism equals the shard count. */
  def shuffleShards(spark: SparkSession, dir: String, nShards: Int = 8,
                    seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = conv(substring(
      md5(concat(col("doc_id").cast("string"), lit(":" + seed))), 1, 15),
      16, 10).cast("long")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), key.as("k"))
      .withColumn("shard", col("k") % nShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id")))
        .cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
           sum(col("pos") * (col("doc_id") % 1000)).as("order_chk"))
  }

  def shuffleShardsOracleSql(nShards: Int = 8,
                             seed: String = "graft"): String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |    list_reduce([CAST(strpos('0123456789abcdef', substr(
       |        md5(CAST(doc_id AS VARCHAR) || ':$seed'), p, 1)) - 1
       |      AS BIGINT) for p in range(1, 16)],
       |      (a, b) -> a * 16 + b) AS k
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, k % $nShards AS shard,
       |    row_number() OVER (PARTITION BY k % $nShards
       |                       ORDER BY k, doc_id) AS pos
       |  FROM k)
       |SELECT shard, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(pos * (doc_id % 1000)) AS BIGINT) AS order_chk
       |FROM p GROUP BY 1""".stripMargin

  /** Materialize the shuffled shards: one directory per shard
    * (`shard=N/`), rows within each shard's files in shuffle-key order.
    * `repartitionByRange` on the shard column makes partitions and
    * shards coincide (each output file covers one shard), and the
    * within-partition sort is the per-shard delivery order. */
  def writeShards(spark: SparkSession, dir: String, outPath: String,
                  nShards: Int = 8, seed: String = "graft"): Unit = {
    val key = conv(substring(
      md5(concat(col("doc_id").cast("string"), lit(":" + seed))), 1, 15),
      16, 10).cast("long")
    Tables.load(spark, dir, "documents")
      .withColumn("k", key)
      .withColumn("shard", col("k") % nShards)
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("k"), col("doc_id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard").parquet(outPath)
  }

  /** Incremental dedup: treat sources src0–src9 as the EXISTING corpus
    * and src10+ as the NEW batch; a new doc survives iff its normalized
    * fingerprint (1) is the batch's canonical copy (min doc_id) and
    * (2) does not already exist in the corpus.
    *
    * The synthetic corpus has zero natural exact-fp overlap between the
    * halves, which would make the gate vacuous (identity). Like the PII
    * gate, a deterministic doc_id-keyed injection creates the structure
    * being tested, mirrored verbatim in the oracle: docs with
    * `doc_id % 10 = 7` take the text of `doc_id − 250` (batch→corpus
    * overlap at sf0.01), docs with `doc_id % 50 = 33` take the text of
    * `doc_id − 10` (batch-internal duplicates). Donors always contribute
    * their ORIGINAL text (both engines read the base table for donors),
    * so the injection is order-independent.
    *
    * Scale: the within-batch dedup is one fingerprint shuffle over the
    * new batch only; the corpus check is a left_anti join on the
    * fingerprint — at 100 TB the existing side is the stored fingerprint
    * index of the corpus (bucketed on fp), so appending a daily batch
    * never rescans history. */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val donorExt = base.select((col("doc_id") + 250).as("doc_id"),
                               col("text").as("t_ext"))
    val donorInt = base.select((col("doc_id") + 10).as("doc_id"),
                               col("text").as("t_int"))
    val injected = base
      .join(donorExt, Seq("doc_id"), "left")
      .join(donorInt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 10 === 7 && col("t_ext").isNotNull, col("t_ext"))
          .when(col("doc_id") % 50 === 33 && col("t_int").isNotNull,
                col("t_int"))
          .otherwise(col("text")).as("text"))
    val docs = injected.select(col("doc_id"), col("source"),
      md5(TextAnalysis.normalized(col("text"))).as("fp"))
    val isExisting = col("source").rlike("^src[0-9]$")
    val existing = docs.filter(isExisting).select(col("fp"))
    val batch = docs.filter(!isExisting)
    batch.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_batch_copies"))
      .join(existing, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"), col("n_batch_copies"))
  }

  /** Cross-split leakage audit: duplicate documents whose copies landed
    * in DIFFERENT train/val/test splits — the eval-integrity check a
    * pipeline runs after splitting (a val/test doc with a train-side
    * duplicate silently inflates eval scores). Output: one row per
    * split pair with the number of leaking fingerprint groups and of
    * cross-split doc pairs.
    *
    * The corpus has no natural exact-fingerprint duplicates (q25 groups
    * are all singletons), so — like the incremental-dedup and PII
    * gates — a deterministic doc_id-keyed injection creates the
    * structure under test, mirrored verbatim in the oracle: docs with
    * `doc_id % 25 = 11` take the text of `doc_id − 17` (donors
    * contribute their ORIGINAL text, so injection is order-independent).
    * Whether each injected pair actually crosses a split boundary is
    * then decided by the salted-md5 split itself — the gate verifies
    * split assignment and fingerprinting TOGETHER.
    *
    * Scale: fingerprint shuffle + fingerprint-keyed self-join (group
    * sizes bounded by true duplication, the exact-dedup contract) + a
    * 3-row aggregate. */
  def splitLeakage(spark: SparkSession, dir: String,
                   salt: String = "graft"): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val donor = base.select((col("doc_id") + 17).as("doc_id"),
                            col("text").as("t_d"))
    val injected = base.join(donor, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 25 === 11 && col("t_d").isNotNull, col("t_d"))
          .otherwise(col("text")).as("text"))
    val hexc = substring(
      md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 1)
    val d = injected.select(col("doc_id"),
      when(hexc <= "c", "train").when(hexc === "d", "val")
        .otherwise("test").as("split"),
      md5(TextAnalysis.normalized(col("text"))).as("fp"))
    d.as("a").join(d.as("b"),
        col("a.fp") === col("b.fp") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.split") =!= col("b.split"))
      .select(least(col("a.split"), col("b.split")).as("split_lo"),
              greatest(col("a.split"), col("b.split")).as("split_hi"),
              col("a.fp").as("fp"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(count_distinct(col("fp")).as("n_fp_groups"),
           count(lit(1)).as("n_doc_pairs"))
  }

  def splitLeakageOracleSql(salt: String = "graft"): String =
    s"""WITH inj AS (
       |  SELECT d.doc_id,
       |    CASE WHEN d.doc_id % 25 = 11 AND e.text IS NOT NULL THEN e.text
       |         ELSE d.text END AS text
       |  FROM documents d
       |  LEFT JOIN documents e ON e.doc_id = d.doc_id - 17),
       |f AS (
       |  SELECT doc_id,
       |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':$salt'), 1, 1)
       |              <= 'c' THEN 'train'
       |         WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':$salt'), 1, 1)
       |              = 'd' THEN 'val'
       |         ELSE 'test' END AS split,
       |    md5(trim(regexp_replace(regexp_replace(lower(text),
       |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
       |  FROM inj)
       |SELECT least(a.split, b.split) AS split_lo,
       |       greatest(a.split, b.split) AS split_hi,
       |       count(DISTINCT a.fp) AS n_fp_groups,
       |       count(*) AS n_doc_pairs
       |FROM f a JOIN f b
       |  ON a.fp = b.fp AND a.doc_id < b.doc_id AND a.split <> b.split
       |GROUP BY 1, 2""".stripMargin

  val incrementalDedupOracleSql: String =
    """WITH inj AS (
      |  SELECT d.doc_id, d.source,
      |    CASE WHEN d.doc_id % 10 = 7 AND e.text IS NOT NULL THEN e.text
      |         WHEN d.doc_id % 50 = 33 AND i.text IS NOT NULL THEN i.text
      |         ELSE d.text END AS text
      |  FROM documents d
      |  LEFT JOIN documents e ON e.doc_id = d.doc_id - 250
      |  LEFT JOIN documents i ON i.doc_id = d.doc_id - 10),
      |f AS (
      |  SELECT doc_id, source,
      |    md5(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
      |  FROM inj),
      |batch AS (SELECT fp, min(doc_id) AS doc_id,
      |            count(*) AS n_batch_copies
      |          FROM f WHERE NOT regexp_matches(source, '^src[0-9]$')
      |          GROUP BY fp)
      |SELECT doc_id, fp, n_batch_copies FROM batch b
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM f
      |  WHERE regexp_matches(f.source, '^src[0-9]$') AND f.fp = b.fp)"""
      .stripMargin
}
