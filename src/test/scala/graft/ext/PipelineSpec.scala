package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** End-to-end cleanCorpus: composition invariants against its parts. */
class PipelineSpec extends SparkSpec {

  private lazy val out = Pipeline.cleanCorpus(spark, sfDir).cache()

  test("only quality-kept documents are chunked") {
    val kept = TextAnalysis.qualityFilter(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val chunked = out.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(chunked.subsetOf(kept))
  }

  test("no two surviving documents are near-duplicates of each other") {
    val chunked = out.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val pairs = Dedup.jaccardPairsCached(spark, sfDir, 0.8)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(!(chunked(a) && chunked(b)),
        s"near-dup pair ($a, $b) both survived")
    }
  }

  test("every kept document is either a survivor or reachable from one") {
    // the survivor of each cluster is its minimum doc_id member — so
    // each kept doc is covered: itself a survivor, or paired (possibly
    // transitively) with one. Weak but sufficient check: survivor count
    // equals kept count minus non-representative clustered docs.
    val kept = TextAnalysis.qualityFilter(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = Dedup.jaccardPairsCached(spark, sfDir, 0.8)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => kept(a) && kept(b) }
    // union-find over kept-restricted pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = kept.filter(d => find(d) == d)
    val chunked = out.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(chunked == expected)
  }

  test("chunks of a surviving doc match the standalone chunker") {
    val chunked = out.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val standalone = Chunking.chunks(spark, sfDir)
      .filter(col("doc_id").isin(chunked.toSeq: _*))
      .collect().map(_.toString).sorted.toSeq
    val composed = out.collect().map(_.toString).sorted.toSeq
    assert(composed == standalone)
  }

  test("corpus card totals are internally consistent") {
    val card = Pipeline.corpusCard(spark, sfDir).cache()
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(card.agg(sum("n_docs")).head.getLong(0) == corpus.count(),
      "per-source doc counts must sum to the corpus")
    assert(card.filter(col("n_dup_docs") =!=
      col("n_docs") - col("n_fingerprints")).count() == 0)
    assert(card.filter(col("n_quality_pass") > col("n_docs")).count() == 0)
    assert(card.filter(col("total_tokens") < col("n_docs")).count() == 0,
      "every doc has at least one token in the synthetic corpus")
    card.unpersist()
  }

  test("exportManifest: consistent with survivors and packing bounds") {
    val m = Pipeline.exportManifest(spark, sfDir).cache()
    // per-source doc counts must equal the survivor set's
    val surv = Pipeline.survivingDocs(spark, sfDir)
      .join(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id")
      .groupBy("source").count()
    val mismatch = m.join(surv, "source")
      .filter(col("n_docs") =!= col("count"))
    assert(mismatch.count() == 0, "manifest doc counts != survivors")
    // packing bound: seqLen*(n_packs-1) < total_tokens <= seqLen*n_packs
    assert(m.filter(col("total_tokens") > col("n_packs") * 256).count() == 0)
    assert(m.filter(col("total_tokens") <= (col("n_packs") - 1) * 256)
      .count() == 0)
    // order-sensitive checksum is deterministic across runs
    val chk1 = m.select("source", "layout_chk").collect()
      .map(_.toString).sorted.toSeq
    val chk2 = Pipeline.exportManifest(spark, sfDir)
      .select("source", "layout_chk").collect()
      .map(_.toString).sorted.toSeq
    assert(chk1 == chk2)
    m.unpersist()
  }
}
