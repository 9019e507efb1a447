package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: schema, per-partition batch
  * processing, frame sampling. The codec itself is a documented stub. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table has the binary + typed-metadata schema") {
    val df = Multimodal.mediaTable(spark, sfDir)
    val s = df.schema
    assert(s("payload").dataType.typeName == "binary")
    assert(s("format").dataType.typeName == "string")
    assert(s("width").dataType.typeName == "integer")
    assert(df.count() > 0)
  }

  test("feature extraction: histogram sums to 1, mean byte in range") {
    val feats = Multimodal.extractFeatures(spark, sfDir).cache()
    val bad = feats.filter(f =>
      math.abs(f.feature.sum - 1.0) > 1e-9 ||
      f.mean_byte < 0 || f.mean_byte > 255 ||
      f.n_bytes <= 0).count()
    assert(bad == 0)
    feats.unpersist()
  }

  test("fake codec is deterministic on a known payload") {
    val payload = "abc".getBytes("UTF-8") // 97,98,99 -> bucket 3 (>>5)
    val f = Multimodal.FakeCodec.decodeToFeature(payload)
    assert(f(3) == 1.0 && f.sum == 1.0)
  }

  test("frame sampler: stride-spaced indices, bounded frame size") {
    val frames = Multimodal.sampleFrames(spark, sfDir,
      frameBytes = 64, stride = 4).cache()
    assert(frames.count() > 0)
    assert(frames.filter(pmod(col("frame_idx"), lit(4)) =!= 0).count() == 0)
    assert(frames.filter(length(col("frame")) > 64).count() == 0)
    frames.unpersist()
  }

  test("featureSummary groups by format over all media") {
    val df = Multimodal.featureSummary(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("png", "jpeg", "webp")))
    assert(rows.map(r => r.getLong(1)).sum ==
      Multimodal.mediaTable(spark, sfDir).count())
  }
}
