package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** BPE encoding (q214) against an in-memory apply of the in-memory
  * trainer: same tokenization, same merges, same per-source stats. */
class BpeEncodeSpec extends SparkSpec {

  private val NMerges = 6

  /** (source, words-per-doc) rows with the shared normalization. */
  private def docWords(): Seq[(Long, String, Seq[String])] =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map { r =>
        val ws = r.getString(2).toLowerCase
          .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
          .split(" ").filter(_.nonEmpty).toSeq
        (r.getLong(0), r.getString(1), ws)
      }.toSeq

  /** Train merges on the global vocab, return each word's token count. */
  private def modelTokens(dw: Seq[(Long, String, Seq[String])])
      : Map[String, Int] = {
    val vocab: Map[String, Long] = dw.flatMap(_._3)
      .groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    var syms: Map[String, Vector[String]] =
      vocab.keys.map(w => w -> w.split("").toVector).toMap
    for (_ <- 1 to NMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (w, s) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + vocab(w)
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), _) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        syms = syms.map { case (w, s) =>
          w -> s.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
            else acc :+ x
          }
        }
      }
    }
    syms.map { case (w, s) => w -> s.size }
  }

  test("per-source token stats equal the in-memory trainer's encode") {
    val dw = docWords()
    val tok = modelTokens(dw)
    val expected = dw.filter(_._3.nonEmpty)
      .groupBy(_._2).map { case (src, docs) =>
        val words = docs.flatMap(_._3)
        (src, docs.map(_._1).distinct.size.toLong, words.size.toLong,
         words.map(w => tok(w).toLong).sum)
      }.toSet
    val got = TextAnalysis.bpeEncode(spark, sfDir, NMerges)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3))).toSet
    assert(got == expected)
  }

  test("fertility is strictly below character count: merges compress") {
    val row = TextAnalysis.bpeEncode(spark, sfDir, NMerges)
      .agg(sum("n_tokens").as("t"), sum("n_words").as("w")).collect()(0)
    val (t, w) = (row.getLong(0), row.getLong(1))
    // at least one token per word, and merges must have fused SOMETHING
    assert(t >= w, s"tokens $t < words $w")
    val chars = docWords().flatMap(_._3).map(_.length.toLong).sum
    assert(t < chars, s"tokens $t did not compress below chars $chars")
  }
}
