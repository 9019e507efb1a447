package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus partitioning: deterministic hash split + incremental dedup. */
class SplitsSpec extends SparkSpec {

  test("hash split is deterministic, total, and near the 13/1/2 ratio") {
    val a = Splits.hashSplit(spark, sfDir).cache()
    val b = Splits.hashSplit(spark, sfDir)
    // identical on re-run (no order/partition dependence)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    val n = a.count()
    val byPart = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPart.values.sum == n, "every doc gets exactly one split")
    // md5 hex chars are uniform: train 13/16, val 1/16, test 2/16;
    // loose bands — this asserts the mapping, not the RNG
    assert(byPart("train").toDouble / n > 0.70)
    assert(byPart("val").toDouble / n < 0.15)
    assert(byPart("test").toDouble / n < 0.25)
    a.unpersist()
  }

  test("hash split plan is a pure scan+project — no shuffle") {
    val plan = Splits.hashSplit(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "split assignment must not shuffle — it runs at scan speed")
  }

  test("different salts give different (but internally stable) splits") {
    val a = Splits.hashSplit(spark, sfDir, salt = "graft")
    val b = Splits.hashSplit(spark, sfDir, salt = "other")
    val moved = a.as("a").join(b.as("b"), "doc_id")
      .filter(col("a.split") =!= col("b.split")).count()
    assert(moved > 0, "salt must decorrelate assignments")
  }

  test("split leakage counts exactly the injected cross-split dup pairs") {
    val out = Splits.splitLeakage(spark, sfDir).cache()
    // only distinct ordered split pairs, each at most once
    assert(out.count() <= 3)
    assert(out.filter(col("split_lo") >= col("split_hi")).count() == 0)
    assert(out.filter(col("n_doc_pairs") < col("n_fp_groups")).count() == 0)
    // cross-check the total against a direct computation: injected pairs
    // (i, i-17) with i % 25 = 11 whose endpoints hash to different splits
    val splits = Splits.hashSplit(spark, sfDir)
      .select(col("doc_id"), col("split"))
    val expected = splits.as("a").join(
        splits.as("b"),
        col("a.doc_id") === col("b.doc_id") + 17 &&
        col("a.doc_id") % 25 === 11 &&
        col("a.split") =!= col("b.split"))
      .count()
    assert(expected > 0, "injection must produce cross-split dups")
    val total = out.agg(sum("n_doc_pairs")).head.getLong(0)
    assert(total == expected,
      s"leaked pairs $total must equal injected cross-split pairs $expected")
    out.unpersist()
  }

  test("shuffle shards: total, deterministic, and position-exact") {
    val out = Splits.shuffleShards(spark, sfDir).cache()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    // every doc lands in exactly one shard
    assert(out.agg(sum("n")).head.getLong(0) == nDocs)
    assert(out.count() == 8)
    // deterministic on re-run
    val again = Splits.shuffleShards(spark, sfDir)
    assert(out.collect().toSet == again.collect().toSet)
    // a different seed reshuffles: per-shard checksums change even if
    // counts stay similar
    val other = Splits.shuffleShards(spark, sfDir, seed = "other")
    assert(out.collect().map(_.getLong(2)).toSet !=
           other.collect().map(_.getLong(2)).toSet)
    out.unpersist()
  }

  test("writeShards delivers one dir per shard, sorted by shuffle key") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    Splits.writeShards(spark, sfDir, tmp, nShards = 4)
    val dirs = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    // within a shard, file order is ascending shuffle-key order
    import org.apache.spark.sql.functions.{col, conv, concat, lit,
      md5, substring}
    val key = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":graft"))), 1, 15), 16, 10).cast("long")
    val files = new java.io.File(s"$tmp/shard=0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ks = spark.read.parquet(f.getAbsolutePath).select(key)
        .collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted),
        s"rows in ${f.getName} must be key-sorted")
    }
    // shards partition the corpus
    assert(spark.read.parquet(tmp).count() ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
  }

  test("incremental dedup drops corpus-known and batch-dup fingerprints") {
    val kept = Splits.incrementalDedup(spark, sfDir).cache()
    // every kept fp is unique in the output (canonical copy only)
    assert(kept.groupBy("fp").count().filter(col("count") > 1).count() == 0)
    // the injection creates known drops: kept < batch size
    val batchSize = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(!col("source").rlike("^src[0-9]$")).count()
    assert(kept.count() < batchSize,
      s"gate must be non-vacuous: kept=${kept.count()} batch=$batchSize")
    // copy counts are consistent: each kept fp has >=1 batch copy and
    // the copies cannot exceed the batch itself
    assert(kept.filter(col("n_batch_copies") < 1).count() == 0)
    val copies = kept.agg(sum("n_batch_copies")).head.getLong(0)
    assert(copies <= batchSize)
    kept.unpersist()
  }

  test("stratifiedSplit: exact per-source proportions, stable, md5-ordered") {
    val rows = Splits.stratifiedSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.nonEmpty)
    // per-source counts are EXACTLY the ceil cuts
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val n = rs.length.toLong
      val train = rs.count(_._3 == "train").toLong
      val value = rs.count(_._3 == "val").toLong
      def cut(p: Long) = (n * p + 99L) / 100L   // #{r : 100r < p·n}
      assert(train == cut(80L), s"$src train $train != ${cut(80L)}")
      assert(train + value == cut(90L), s"$src val")
    }
    // the hierarchical rank equals the naive single-window rank: the
    // split of each doc matches a driver-side recompute
    def key(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val n = rs.length.toLong
      val ordered = rs.sortBy(r => (key(r._1), r._1))
      ordered.zipWithIndex.foreach { case ((id, src, split), r) =>
        val expect = if (100L * r < 80L * n) "train"
                     else if (100L * r < 90L * n) "val" else "test"
        assert(split == expect, s"doc $id in $src at rank $r")
      }
    }
  }
}
