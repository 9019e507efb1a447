package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling: reproducibility and rate shape. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("mixture sample is deterministic across runs") {
    val a = Sampling.mixtureSample(spark, sfDir)
      .as[(Long, String)].collect().toSet
    val b = Sampling.mixtureSample(spark, sfDir)
      .as[(Long, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("per-source rates match the mixture policy within md5 tolerance") {
    val rates = Sampling.mixtureRates(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(rates.nonEmpty)
    rates.foreach { case (source, total, kept) =>
      val expect = if (source.length <= 4) 0.75 else 0.25
      val got = kept.toDouble / total
      // md5 digits are uniform; small per-source corpora wander a bit
      assert(math.abs(got - expect) < 0.2,
        s"$source: got $got, expected ~$expect")
    }
  }

  test("sample is a subset of the corpus with source preserved") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source")).as[(Long, String)]
      .collect().toMap
    val kept = Sampling.mixtureSample(spark, sfDir)
      .as[(Long, String)].collect()
    assert(kept.forall { case (id, src) => docs.get(id).contains(src) })
    assert(kept.length < docs.size)
  }
}
