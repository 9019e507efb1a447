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

  test("temperatureRates: normalized, small sources upweighted") {
    val rows = Sampling.temperatureRates(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4,
      "rates must normalize to ~1")
    // alpha=0.5 compresses the spread: rate ratio < count ratio for
    // any two sources with different sizes
    for (Seq(a, b) <- rows.sortBy(_._2).combinations(2).map(_.toSeq)
         if a._2 < b._2) {
      assert(b._3 / a._3 < b._2.toDouble / a._2 + 1e-9,
        s"${a._1} vs ${b._1}: temperature must compress the ratio")
    }
  }

  test("reservoirSample: heap-partial result equals the naive window") {
    val got = Sampling.reservoirSample(spark, sfDir, k = 7)
    val naive = Sampling.reservoirSampleNaive(spark, sfDir, k = 7)
    assert(got.count() > 0)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("reservoirSample: exactly min(k, source size) rows per source") {
    val sizes = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSource = Sampling.reservoirSample(spark, sfDir, k = 20)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.keySet == sizes.keySet)
    perSource.foreach { case (s, n) =>
      assert(n == math.min(20L, sizes(s)), s"$s: $n")
    }
  }

  test("reservoirSample is deterministic across runs and repartitionings") {
    val a = Sampling.reservoirSample(spark, sfDir, k = 5).collect()
      .map(_.toString).sorted.toSeq
    val b = Sampling.reservoirSample(spark, sfDir, k = 5).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("reservoirSample rejects non-positive k") {
    intercept[IllegalArgumentException] {
      Sampling.reservoirSample(spark, sfDir, k = 0)
    }
  }

  test("lengthCurriculum: distributed rank equals the plain-window bins") {
    import org.apache.spark.sql.expressions.Window
    val got = Sampling.lengthCurriculum(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
                                  r.getLong(3), r.getLong(4)))).toMap
    // reference: the naive single-window formulation of the same formula
    val nTok = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
              expr("size(regexp_extract_all(text, '([A-Za-z0-9]+)', 1))")
                .cast("long").as("n_tokens"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_tokens"), col("doc_id"))).cast("long"))
    val n = nTok.count()
    val expected = nTok.withColumn("bucket", expr(s"(10 * (rk - 1)) div $n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), min("n_tokens"), max("n_tokens"),
           sum("n_tokens"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
                                  r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
    assert(got.size == 10)
    // bins are monotone: decile d's max <= decile d+1's min
    (0L to 8L).foreach(d => assert(got(d)._3 <= got(d + 1)._2))
  }

  test("mixture plan: integer allocation invariants and recompute") {
    val rows = Sampling.mixturePlan(spark, sfDir,
      budgetTokens = 50000L, capTokens = 5000L).collect()
    val total = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val (tokens, target, epochs) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(target == math.min(5000L, tokens * 50000L / total))
      assert(epochs == (target + tokens - 1) / tokens)
      assert(target <= 5000L)
      if (target > 0) assert(epochs >= 1L) else assert(epochs == 0L)
    }
    // capped sources exist OR every share fits — either way the plan
    // never exceeds budget + one cap per source
    assert(rows.map(_.getLong(3)).sum <= 50000L + 5000L * rows.length)
  }
}
