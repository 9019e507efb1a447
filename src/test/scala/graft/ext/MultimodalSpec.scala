package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing with REAL JDK codecs: the payloads
  * are genuine PNG/GIF/BMP bytes and decode goes through javax.imageio. */
class MultimodalSpec extends SparkSpec {

  test("media table has the binary + typed-metadata schema") {
    val df = Multimodal.mediaTable(spark, sfDir)
    val s = df.schema
    assert(s("payload").dataType.typeName == "binary")
    assert(s("format").dataType.typeName == "string")
    assert(s("width").dataType.typeName == "integer")
    assert(df.count() > 0)
  }

  test("codec round trip: all three formats decode to the encoded image") {
    (0L until 60L).foreach { id =>
      val payload = Multimodal.Codec.encode(id)
      // real container bytes, not raw pixels: PNG/GIF/BMP magic numbers
      val magicOk = Multimodal.Codec.formatFor(id) match {
        case "png" => (payload(0) & 0xFF) == 0x89 && payload(1) == 'P'
        case "gif" => payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F'
        case "bmp" => payload(0) == 'B' && payload(1) == 'M'
      }
      assert(magicOk, s"id=$id wrong magic for ${Multimodal.Codec.formatFor(id)}")
      val d = Multimodal.Codec.decode(payload)
      assert(d.width == Multimodal.Codec.widthFor(id))
      assert(d.height == Multimodal.Codec.heightFor(id))
      assert(d.meanPx == Multimodal.Codec.grayFor(id).toDouble,
        s"id=$id decoded mean ${d.meanPx} != ${Multimodal.Codec.grayFor(id)}")
      // solid image: all histogram mass in the gray's bucket
      assert(d.hist(Multimodal.Codec.grayFor(id) >> 5) == 1.0)
      assert(math.abs(d.hist.sum - 1.0) < 1e-12)
    }
  }

  test("feature extraction decodes real bytes distributed") {
    val feats = Multimodal.extractFeatures(spark, sfDir).cache()
    val bad = feats.filter(f =>
      math.abs(f.feature.sum - 1.0) > 1e-9 ||
      f.mean_px != Multimodal.Codec.grayFor(f.media_id).toDouble ||
      f.width != Multimodal.Codec.widthFor(f.media_id) ||
      f.height != Multimodal.Codec.heightFor(f.media_id) ||
      f.n_bytes <= 0).count()
    assert(bad == 0)
    feats.unpersist()
  }

  test("frame sampler: stride-spaced indices, bounded frame size") {
    val frames = Multimodal.sampleFrames(spark, sfDir,
      frameBytes = 64, stride = 4).cache()
    assert(frames.count() > 0)
    assert(frames.filter(pmod(col("frame_idx"), lit(4)) =!= 0).count() == 0)
    assert(frames.filter(length(col("frame")) > 64).count() == 0)
    frames.unpersist()
  }

  test("audio: WAV round trip recovers frames, rate, and amplitudes") {
    for (id <- Seq(0L, 1L, 7L, 255L, 54321L)) {
      val wav = Multimodal.AudioCodec.encode(id)
      // genuine RIFF/WAVE container
      assert(new String(wav.take(4), "US-ASCII") == "RIFF")
      assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
      val d = Multimodal.AudioCodec.decode(wav)
      val n = Multimodal.AudioCodec.nFramesFor(id)
      val samples = (0 until n).map(Multimodal.AudioCodec.sampleFor(id, _))
      assert(d.nFrames == n.toLong)
      assert(d.sampleRate == Multimodal.AudioCodec.SampleRate)
      assert(d.sumAmp == samples.map(_.toLong).sum)
      assert(d.minAmp == samples.min && d.maxAmp == samples.max)
    }
  }

  test("audio: decode rejects non-WAV payloads loudly") {
    intercept[Exception] {
      Multimodal.AudioCodec.decode(Array.fill[Byte](64)(7))
    }
  }

  test("audioFeatures over the corpus matches the per-id formula") {
    val feats = Multimodal.audioFeatures(spark, sfDir).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val n = Multimodal.AudioCodec.nFramesFor(f.media_id)
      val samples =
        (0 until n).map(Multimodal.AudioCodec.sampleFor(f.media_id, _))
      assert(f.n_frames == n.toLong && f.sample_rate == 8000L)
      assert(f.sum_amp == samples.map(_.toLong).sum)
      assert(f.min_amp == samples.min.toLong &&
             f.max_amp == samples.max.toLong)
    }
  }

  test("image metadata scan prunes the payload leaf (never reads bytes)") {
    import org.apache.spark.sql.functions._
    val df = Multimodal.imageMetaSummary(spark, sfDir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // nested schema pruning narrows the struct to the metadata leaves:
    // the parquet ReadSchema must carry format/width/height and NO
    // data/path field — the payload column chunks are never opened
    assert(p.contains("image:struct<format:string,width:int,height:int>"),
      s"scan must read only the metadata leaves of the struct:\n$p")
    assert(!p.contains("data:binary"),
      s"payload leaf must be pruned from the scan:\n$p")
    // and the layout round-trips: metadata in the file equals the
    // deterministic per-id rules
    val byFormat = df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDocs = graft.Tables.load(spark, sfDir, "documents").count()
    assert(byFormat.values.sum == nDocs)
    assert(byFormat.keySet == Set("png", "gif", "bmp"))
  }

  test("featureSummary matches the analytic per-format sums") {
    val rows = Multimodal.featureSummary(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
                                   r.getLong(4), r.getLong(5))).toMap
    val ids = Multimodal.mediaTable(spark, sfDir)
      .select("media_id").collect().map(_.getLong(0))
    val expected = ids.groupBy(Multimodal.Codec.formatFor).map {
      case (fmt, gs) =>
        fmt -> ((gs.length.toLong,
                 gs.map(Multimodal.Codec.widthFor(_).toLong).sum,
                 gs.map(Multimodal.Codec.heightFor(_).toLong).sum,
                 gs.map(Multimodal.Codec.grayFor(_).toLong).sum,
                 gs.count(Multimodal.Codec.grayFor(_) < 32).toLong))
    }
    assert(rows == expected)
  }

  /** The oracle's closed form, in Scala: bilinear of an affine ramp is
    * the ramp at the clamped sample coordinate. */
  private def gradientClosedForm(base: Int, w: Int, h: Int,
                                 tw: Int = 8, th: Int = 8): Long = {
    var sum = 0L
    for (ty <- 0 until th; tx <- 0 until tw) {
      val sx = (2 * tx + 1) * w / (2.0 * tw) - 0.5
      val sy = (2 * ty + 1) * h / (2.0 * th) - 0.5
      val cx = math.min(math.max(sx, 0.0), w - 1.0)
      val cy = math.min(math.max(sy, 0.0), h - 1.0)
      sum += math.floor(base + 2 * cx + 4 * cy + 0.5).toLong
    }
    sum
  }

  private def solidImage(w: Int, h: Int, g: Int) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, (g << 16) | (g << 8) | g)))
    img
  }

  test("resize gate equals the per-doc closed form, per format") {
    val out = Multimodal.resizeSummary(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0))
    val C = Multimodal.Codec
    val expected = ids.groupBy(C.formatFor).map { case (f, gs) =>
      f -> (gs.length.toLong,
            gs.map(id => gradientClosedForm(
              C.gradBaseFor(id), C.widthFor(id), C.heightFor(id))).sum)
    }
    assert(out == expected)
  }

  test("bilinear kernel: constant images are interpolation-invariant") {
    for (w <- Seq(4, 11, 16); h <- Seq(4, 7, 10); g <- Seq(0, 130, 255))
      assert(Multimodal.bilinearGraySum(solidImage(w, h, g), 8, 8)
        == g.toLong * 64)
  }

  test("gradient encode->decode is lossless in every format") {
    // covers GIF palettization: the ramp has <= 130 distinct colors
    for (id <- Seq(0L, 1L, 2L, 63L, 64L, 100L, 255L)) {
      val C = Multimodal.Codec
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(C.encodeGradient(id)))
      val b = C.gradBaseFor(id)
      for (y <- 0 until C.heightFor(id); x <- 0 until C.widthFor(id))
        assert((img.getRGB(x, y) & 0xFF) == b + 2 * x + 4 * y,
               s"id=$id px($x,$y)")
    }
  }

  test("kernel distinguishes bilinear from nearest-neighbor on ramps") {
    // nearest-neighbor resample of the same gradients; must diverge on
    // some source shapes (measured: 35 of 91), so the closed-form gate
    // fails any NN kernel
    def nnSum(base: Int, w: Int, h: Int): Long = {
      var sum = 0L
      for (ty <- 0 until 8; tx <- 0 until 8) {
        val sx = (2 * tx + 1) * w / 16.0 - 0.5
        val sy = (2 * ty + 1) * h / 16.0 - 0.5
        val px = math.min(math.max(math.floor(sx + 0.5).toInt, 0), w - 1)
        val py = math.min(math.max(math.floor(sy + 0.5).toInt, 0), h - 1)
        sum += base + 2 * px + 4 * py
      }
      sum
    }
    val diverging = for {
      w <- 4 to 16; h <- 4 to 10
      if nnSum(0, w, h) != gradientClosedForm(0, w, h)
    } yield (w, h)
    assert(diverging.size == 35)
  }

  test("kernel matches closed form on every gradient shape") {
    val C = Multimodal.Codec
    for (id <- 0L until 91L) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(C.encodeGradient(id)))
      assert(Multimodal.bilinearGraySum(img, 8, 8) ==
        gradientClosedForm(C.gradBaseFor(id), C.widthFor(id),
                           C.heightFor(id)), s"id=$id")
    }
  }

  test("resize actually resamples: a bicolor image lands strictly between") {
    // a half-black/half-white source must produce a resized sum strictly
    // inside (0, 255 * area), identical across repeated runs
    val w = 12; val h = 6
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    })
    val s1 = Multimodal.bilinearGraySum(img, 8, 8)
    assert(s1 > 0 && s1 < 255L * 64)
    assert(s1 == Multimodal.bilinearGraySum(img, 8, 8))
  }

  test("animated GIF round trip: frame count and per-frame grays exact") {
    import Multimodal.VideoCodec
    for (id <- Seq(0L, 7L, 123L, 255L, 999L)) {
      val payload = VideoCodec.encode(id)
      // stride 1: every frame decoded
      val (n, grays) = VideoCodec.decodeSampled(payload, 1)
      assert(n == VideoCodec.nFramesFor(id), s"id=$id frame count")
      assert(grays == (0 until n).map(f => VideoCodec.grayFor(id, f)),
        s"id=$id decoded frame grays")
      // stride 2: only sampled indices
      val (_, sampled) = VideoCodec.decodeSampled(payload, 2)
      assert(sampled == (0 until n by 2).map(f => VideoCodec.grayFor(id, f)))
    }
  }

  test("videoFrameStats equals the closed form on sf0.001") {
    val got = Multimodal.videoFrameStats(spark, sfDir).collect()
      .map(s => s.media_id -> ((s.n_frames, s.n_sampled, s.sum_gray))).toMap
    assert(got.size == 500)
    got.foreach { case (id, (n, ns, sg)) =>
      val exp = (0 until Multimodal.VideoCodec.nFramesFor(id) by 2)
      assert(n == Multimodal.VideoCodec.nFramesFor(id).toLong)
      assert(ns == exp.length.toLong)
      assert(sg == exp.map(f =>
        Multimodal.VideoCodec.grayFor(id, f).toLong).sum, s"id=$id")
    }
  }

  private def decoded(id: Long) = javax.imageio.ImageIO.read(
    new java.io.ByteArrayInputStream(Multimodal.Codec.encodeGradient(id)))

  test("dHash is brightness-invariant and shape-sensitive") {
    // ids 91 apart share (w, h) but differ in base brightness:
    // the perceptual hash must agree while the pixel sums differ
    assert(Multimodal.dhashOf(decoded(3L)) ==
           Multimodal.dhashOf(decoded(3L + 91L)))
    assert(Multimodal.bilinearGraySum(decoded(3L), 8, 8) !=
           Multimodal.bilinearGraySum(decoded(3L + 91L), 8, 8))
    // shape sensitivity is asserted globally by the census test below
    // (more than one distinct hash across the 91 sampling shapes)
  }

  test("dHash census conserves images and is bounded by shapes") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.imageDhashCensus(spark, sfDir).collect()
    assert(out.nonEmpty && out.length > 1)
    // one gradient image per document; 91 (w, h) shapes bound the space
    assert(out.length <= 91)
    val total = graft.Tables.load(spark, sfDir, "documents").count()
    assert(out.map(_.getLong(1)).sum == total)
    // every hash is a 56-char bit string
    assert(out.forall(r => r.getString(0).length == 56 &&
      r.getString(0).forall(c => c == '0' || c == '1')))
  }
}
