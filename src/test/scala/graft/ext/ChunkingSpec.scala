package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Token-window chunking invariants on the real documents table. */
class ChunkingSpec extends SparkSpec {

  private lazy val chunks = Chunking.chunks(spark, sfDir).cache()

  private lazy val tokenCounts = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"),
            size(split(TextAnalysis.normalized(col("text")), " "))
              .cast("long").as("n_toks"))
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chunk indices are contiguous from 0 and counts match the formula") {
    val perDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("chunk_idx").as("lo"),
           max("chunk_idx").as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3)))
    assert(perDoc.nonEmpty)
    perDoc.foreach { case (doc, n, lo, hi) =>
      assert(lo == 0L && hi == n - 1, s"doc $doc gaps: n=$n lo=$lo hi=$hi")
      val l = tokenCounts(doc)
      val expect = if (l <= 32) 1L else (l - 32 + 15) / 16 + 1
      assert(n == expect, s"doc $doc: $n chunks for $l tokens")
    }
  }

  test("window starts advance by the stride and tails clamp") {
    val rows = chunks
      .select("doc_id", "chunk_idx", "start_tok", "n_chunk_tokens")
      .collect()
    rows.foreach { r =>
      val (doc, i, start, n) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(start == i * 16 + 1)
      val l = tokenCounts(doc)
      assert(n == math.min(32L, l - i * 16), s"doc $doc chunk $i")
      assert(n >= 1)
    }
  }

  test("stride < seqLen reproduces every token in overlap positions") {
    // with stride 16 / seqLen 32, consecutive chunks overlap by 16
    // tokens; the chunk hash of (doc, i) over positions [16i+1, 16i+32]
    // means total coverage = union of windows = [1, len]. Verified via
    // the count identity: sum over chunks of (fresh tokens per chunk)
    // == token count. Fresh tokens = n for chunk 0, min(stride, n) after.
    val fresh = chunks
      .withColumn("fresh",
        when(col("chunk_idx") === 0, col("n_chunk_tokens"))
          .otherwise(least(lit(16L),
            col("n_chunk_tokens") - (32 - 16))))
      .groupBy("doc_id").agg(sum("fresh").as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fresh.foreach { case (doc, covered) =>
      assert(covered == tokenCounts(doc),
        s"doc $doc covered $covered of ${tokenCounts(doc)}")
    }
  }

  test("a short document yields exactly one clamped chunk") {
    val shortDocs = tokenCounts.filter(_._2 <= 32).keySet
    if (shortDocs.nonEmpty) {
      val n = chunks.filter(col("doc_id").isin(shortDocs.toSeq: _*))
        .groupBy("doc_id").count().collect()
      n.foreach(r => assert(r.getLong(1) == 1L))
    }
  }

  test("chunking is a pure map — no shuffle in the plan") {
    val plan = Chunking.chunks(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("seqLen/stride must be positive") {
    intercept[IllegalArgumentException] {
      Chunking.chunks(spark, sfDir, seqLen = 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunks(spark, sfDir, stride = -1)
    }
  }
}
