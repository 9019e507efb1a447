package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Phrase retrieval (q114) + JL projection audit (q115). */
class SearchProjectionSpec extends SparkSpec {

  test("phrase hits equal a regex count over the normalized text") {
    val out = Search.topPhraseSearch(spark, sfDir).collect()
    assert(out.nonEmpty)
    val gram = out.head.getString(1)
    assert(out.forall(_.getString(1) == gram))
    // independent recount: occurrences of the phrase in each normalized
    // document (overlap-free is irrelevant for a 2-gram of single words:
    // positional intersection counts every adjacent pair, as does a
    // sliding scan)
    val Seq(w1, w2) = gram.split(" ").toSeq
    val expected = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
              split(TextAnalysis.normalized(col("text")), " ").as("ws"))
      .select(col("doc_id"), expr(
        s"""size(filter(sequence(1, size(ws) - 1),
           |  i -> ws[i - 1] = '$w1' AND ws[i] = '$w2'))""".stripMargin)
        .as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("JL audit: unbiased norm preservation with the k=16 spread") {
    val rows = Projection.jlNormAudit(spark, sfDir).collect()
    assert(rows.length == 500)
    val ratios = rows.map(_.getDouble(3))
    assert(ratios.forall(_ > 0.0))
    val mean = ratios.sum / ratios.length
    // E[ratio] = 1; with k=16 the per-vector spread is ~sqrt(2/16)=0.35
    // but the MEAN over 500 vectors concentrates hard
    assert(math.abs(mean - 1.0) < 0.15, s"mean ratio $mean")
    // determinism (fixed-seed matrix, fixed fold order)
    val again = Projection.jlNormAudit(spark, sfDir).collect()
      .map(_.getDouble(3))
    assert(again.toSeq == ratios.toSeq)
  }

  test("posting lists: df/tf conservation and sorted capped heads") {
    val idx = Search.postingLists(spark, sfDir, cap = 10).collect()
    assert(idx.nonEmpty)
    // token mass conservation: sum of per-term totals == corpus tokens
    val totalTf = idx.map(_.getLong(2)).sum
    val corpusTokens = Tables.load(spark, sfDir, "documents")
      .select(size(filter(
        split(TextAnalysis.normalized(col("text")), " "),
        t => t =!= "")))
      .collect().map(_.getInt(0).toLong).sum
    assert(totalTf == corpusTokens, s"$totalTf != $corpusTokens")
    idx.foreach { r =>
      val df = r.getLong(1)
      val head = r.getString(3).split(",").filter(_.nonEmpty).map(_.toLong)
      assert(head.length == math.min(df, 10L),
        s"head holds min(df, cap) ids for ${r.getString(0)}")
      assert(head.sameElements(head.sorted), "postings ascend")
      assert(df >= head.length && r.getLong(2) >= df,
        "tf >= df >= |head|")
    }
  }
}
