package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-frequency spectrum + cross-source overlap matrix. */
class SpectrumSpec extends SparkSpec {

  test("bands partition the vocabulary and conserve occurrence totals") {
    val spec = TextAnalysis.tokenFrequencySpectrum(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3)))
    assert(spec.nonEmpty)
    // band k holds counts in [2^k, 2^(k+1)): occurrences bounded by
    // types × band range
    spec.foreach { case (src, band, types, occ) =>
      assert(band >= 0)
      assert(occ >= types * (1L << band), s"$src band $band")
      assert(occ < types * (1L << (band + 1)), s"$src band $band")
    }
    // totals across bands == raw token count per source
    val totals = spec.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val raw = graft.Tables.load(spark, sfDir, "documents")
      .select(col("source"),
              explode(split(TextAnalysis.normalized(col("text")), " "))
                .as("t"))
      .filter(col("t") =!= "")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals == raw)
  }

  test("band formula equals floor(log2(n)) computed exactly") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("n")
      .withColumn("band", (length(bin(col("n"))) - 1).cast("long"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 7L -> 2L,
                      8L -> 3L, 1023L -> 9L, 1024L -> 10L))
  }

  test("sourceOverlap canonicalizes and conserves the pair count") {
    val pairs = Dedup.minhashLshCached(spark, sfDir, 0.5)
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val m = Dedup.sourceOverlap(pairs, docs)
      .collect().map(r => ((r.getString(0), r.getString(1)),
                           r.getLong(2)))
    assert(m.nonEmpty)
    m.foreach { case ((lo, hi), n) =>
      assert(lo <= hi); assert(n > 0)
    }
    assert(m.map(_._2).sum == pairs.count())
    // equals a driver-side recount from the raw pairs
    val srcOf = docs.select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = pairs.select("a_id", "b_id").collect()
      .map(r => (srcOf(r.getLong(0)), srcOf(r.getLong(1))))
      .map { case (a, b) => (Ordering[String].min(a, b),
                             Ordering[String].max(a, b)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(m.toMap == expect)
  }
}
