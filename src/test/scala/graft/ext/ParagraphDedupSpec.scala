package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** CCNet-style paragraph dedup (q211): the survivor rule, completeness,
  * and reassembly order, checked against a from-scratch Scala model of
  * the same segmentation on the real documents table. */
class ParagraphDedupSpec extends SparkSpec {

  private val ParaLen = 8

  /** The operator's segmentation, recomputed independently in Scala:
    * normalize → split → fixed 8-token windows. */
  private lazy val modelParas: Seq[(Long, Int, String)] = {
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val toks = r.getString(1).toLowerCase
          .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
          .split(" ").filter(_.nonEmpty)
        toks.grouped(ParaLen).zipWithIndex.map { case (w, i) =>
          (r.getLong(0), i, w.mkString(" "))
        }
      }.toSeq.sortBy(t => (t._1, t._2))
  }

  private lazy val result =
    Dedup.paragraphDedup(spark, sfDir, ParaLen)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_kept"),
                           r.getAs[String]("text_kept")))
      .sortBy(_._1)

  test("output equals the first-occurrence model, doc for doc") {
    val firstOcc = modelParas.groupBy(_._3).map { case (_, occs) =>
      occs.minBy(t => (t._1, t._2))
    }
    val expected = firstOcc.toSeq.groupBy(_._1).map { case (doc, ps) =>
      val ordered = ps.sortBy(_._2)
      (doc, ordered.size.toLong, ordered.map(_._3).mkString(" "))
    }.toSeq.sortBy(_._1)
    assert(result.toSeq == expected)
  }

  test("kept-paragraph count equals the distinct-paragraph count") {
    // one survivor per distinct paragraph content, corpus-wide
    val keptCount = result.map(_._2).sum
    val distinctInput = modelParas.map(_._3).distinct.size
    assert(keptCount == distinctInput.toLong)
  }

  test("survivor stage is a partial-aggregated groupBy, not a window") {
    // the skew defense: a boilerplate paragraph repeated across the
    // corpus must collapse map-side (partial min per input partition)
    // before the hash exchange; a row_number window would funnel every
    // occurrence of the hottest paragraph through one task
    val plan = Dedup.paragraphDedup(spark, sfDir, ParaLen)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"no partial min aggregate in plan:\n$plan")
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
  }

  test("documents made entirely of already-seen paragraphs drop out") {
    val inputDocs = modelParas.map(_._1).distinct.size
    val outputDocs = result.size
    // sf0.001 fixture has exact-duplicate documents (q24's subject);
    // their every paragraph already appeared in the lower-id copy
    assert(outputDocs < inputDocs,
      s"expected at least one fully-deduplicated document " +
      s"($outputDocs vs $inputDocs)")
  }
}
