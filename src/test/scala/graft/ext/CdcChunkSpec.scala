package graft.ext

import graft.SparkSpec
import graft.functions.CdcBoundaries
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: boundary math, codegen parity, the
  * edit-locality property that motivates CDC, and lossless partition. */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private def bruteBoundaries(s: String, w: Int, d: Int): Seq[Int] =
    (w to s.length).filter { i =>
      val h = s.substring(i - w, i).getBytes("UTF-8")
        .foldLeft(0L)((a, c) =>
          (a * CdcBoundaries.Base + (c & 0xff)) % CdcBoundaries.Mod)
      h % d == 0
    }

  private def detString(len: Int, seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("rolling boundaries equal the brute-force per-window fold") {
    for (seed <- 1 to 5) {
      val s = detString(500, seed)
      val got = CdcBoundaries.compute(UTF8String.fromString(s), 16, 64)
        .toIntArray().toSeq
      assert(got == bruteBoundaries(s, 16, 64), s"seed $seed")
    }
    // degenerate inputs
    assert(CdcBoundaries.compute(UTF8String.fromString(""), 16, 64)
      .numElements() == 0)
    assert(CdcBoundaries.compute(UTF8String.fromString("short"), 16, 64)
      .numElements() == 0)
  }

  test("interpreted eval matches codegen result") {
    val s = detString(800, 7)
    val df = Seq(s).toDF("nt")
      .withColumn("b", CdcBoundaries.cdcBoundaries(col("nt"), 16, 64))
    val codegen = df.collect()(0).getSeq[Int](1)
    val interpreted = CdcBoundaries
      .compute(UTF8String.fromString(s), 16, 64).toIntArray().toSeq
    assert(codegen == interpreted)
  }

  test("edit locality: a prefix edit leaves all later chunks identical") {
    val s = detString(3000, 11)
    val docs = Seq((1L, s), (2L, "zzzz " + s)).toDF("doc_id", "text")
    val ch = CdcChunk.chunksOf(docs, 16, 64)
      .select("doc_id", "chunk").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSeq).toMap
    val shared = ch(1L).toSet intersect ch(2L).toSet
    // only the chunk(s) touching the edit point may differ
    assert(ch(1L).size > 5, "fixture must split into several chunks")
    assert(shared.size >= ch(1L).size - 2,
      s"CDC must re-sync after the edit: ${shared.size} of ${ch(1L).size}")
  }

  test("chunks partition the normalized text losslessly") {
    val rebuilt = CdcChunk.chunks(spark, sfDir)
      .groupBy("doc_id")
      .agg(array_join(expr("transform(array_sort(" +
        "collect_list(struct(pos, chunk))), s -> s.chunk)"), "")
        .as("rebuilt"))
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TextAnalysis.normalized(col("text")).as("nt"))
      .filter(col("nt") =!= "")
    val joined = docs.join(rebuilt, "doc_id")
    assert(joined.count() == docs.count())
    assert(joined.filter(col("nt") =!= col("rebuilt")).count() == 0)
  }

  test("chunkDedupStats: bounded ratios, exact-dup docs fully duplicated") {
    val st = CdcChunk.chunkDedupStats(spark, sfDir).cache()
    assert(st.filter(col("n_dup") > col("n_chunks")).count() == 0)
    assert(st.filter(col("dup_ratio") < 0 || col("dup_ratio") > 1).count() == 0)
    // any pair of exact-duplicate documents must score dup_ratio = 1.0
    val fp = TextAnalysis.fingerprint(spark, sfDir)
    val dupDocs = fp.groupBy("fp").agg(countDistinct("doc_id").as("nd"),
        min("doc_id").as("doc_id"))
      .filter(col("nd") > 1).select("doc_id")
    val nonFull = st.join(dupDocs, "doc_id")
      .filter(col("dup_ratio") < 1.0)
    assert(nonFull.count() == 0,
      "every chunk of an exactly-duplicated doc exists in its twin")
    st.unpersist()
  }
}
