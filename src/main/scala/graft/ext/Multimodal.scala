package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed per-partition with REAL codecs.
  *
  * The decode path uses `javax.imageio` (JDK-native — no external
  * libraries), so the payloads are genuine PNG/GIF/BMP bytes and
  * `extractFeatures` performs a real parse+decode per image. The demo
  * media table synthesizes its images deterministically from `doc_id`
  * (solid gray `doc_id % 256`, size derived from `doc_id`), which makes
  * the whole encode→decode→aggregate pipeline exactly checkable by a
  * SQL oracle: any decode defect (channel order, scaling, size) breaks
  * the per-format sums the gate hashes.
  *
  * At 100 TB: payloads stay in executors end-to-end (no driver collect);
  * decode parallelism = partition count via `mapPartitions` on a typed
  * `Dataset` (one iterator per partition, constant memory — the Scala
  * analog of mapInPandas' batch contract); feature vectors are
  * fixed-width arrays so downstream joins/aggs are columnar.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte],
                      format: String, width: Int, height: Int)

  /** Decoded per-image features. `width`/`height`/`mean_px` come from
    * the DECODED pixels, not the metadata — the two agreeing is what the
    * round-trip spec and the q34 oracle verify. `feature` is an 8-bucket
    * luminance histogram (shares sum to 1). */
  case class MediaFeatures(media_id: Long, format: String,
                           width: Int, height: Int, n_bytes: Long,
                           mean_px: Double, feature: Array[Double])

  /** Real JDK codec layer. All three formats are lossless for the
    * solid-color RGB images the demo table generates (PNG always; GIF
    * palettizes exactly ≤256 distinct colors; BMP is raw). */
  object Codec {
    private val Formats = Array("png", "gif", "bmp")
    def formatFor(id: Long): String = Formats((id % 3).toInt)
    def widthFor(id: Long): Int = (id % 13).toInt + 4
    def heightFor(id: Long): Int = (id % 7).toInt + 4
    def grayFor(id: Long): Int = (id % 256).toInt

    // ImageIO's default scratch-file cache costs a temp-file per
    // encode/decode; in-memory streams don't need it
    javax.imageio.ImageIO.setUseCache(false)

    /** Encode the deterministic image for `id` in its format: solid
      * gray `grayFor(id)`, widthFor × heightFor. */
    def encode(id: Long): Array[Byte] = {
      val w = widthFor(id); val h = heightFor(id); val g = grayFor(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ok = javax.imageio.ImageIO.write(img, formatFor(id), bos)
      if (!ok) throw new IllegalStateException(
        s"no ImageIO writer for ${formatFor(id)}")
      bos.toByteArray
    }

    case class Decoded(width: Int, height: Int, meanPx: Double,
                       hist: Array[Double])

    /** Parse + decode real image bytes; mean luminance uses the integer
      * (r+g+b)/3 per pixel so solid-gray images decode to an exact
      * integer-valued mean. */
    def decode(payload: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException("payload is not a decodable image")
      val w = img.getWidth; val h = img.getHeight
      val hist = new Array[Double](8)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                     (rgb & 0xFF)) / 3
          sum += lum
          hist(lum >> 5) += 1.0
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      var j = 0
      while (j < 8) { hist(j) /= n; j += 1 }
      Decoded(w, h, sum.toDouble / n, hist)
    }
  }

  /** Build a media table keyed by `documents.doc_id`: payload = real
    * encoded image bytes (PNG/GIF/BMP by id), metadata derived
    * deterministically. Encoding runs on executors via a typed
    * `mapPartitions` — payloads never touch the driver. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          MediaRow(id, Codec.encode(id), Codec.formatFor(id),
                   Codec.widthFor(id), Codec.heightFor(id))
        }
      }
      .toDF()
  }

  /** Decode + feature-extract, batched per partition. The emitted
    * width/height/mean come from the decoded pixels — the metadata
    * columns are deliberately ignored so the gate exercises the codec. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val d = Codec.decode(r.payload)
        MediaFeatures(r.media_id, r.format, d.width, d.height,
                      r.payload.length.toLong, d.meanPx, d.hist)
      }
    }
  }

  /** Frame sampling for "video" payloads: split the payload into
    * fixed-size chunks (stand-in frames) and emit every `stride`-th one.
    * Pure expression work — posexplode keeps it distributed. */
  def sampleFrames(spark: SparkSession, dir: String,
                   frameBytes: Int = 64, stride: Int = 4): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, int(floor((length(payload) - 1) / $frameBytes))),
             |  i -> substring(payload, i * $frameBytes + 1, $frameBytes))"""
            .stripMargin)).as(Seq("frame_idx", "frame")))
      .filter(pmod(col("frame_idx"), lit(stride)) === 0)

  /** Driver-gate summary: per-format counts and integer sums of the
    * DECODED width/height/gray plus the count of images whose whole
    * histogram mass sits in bucket 0 (gray < 32). All columns are exact
    * integers — no float rounding — and every value is analytically
    * derivable from doc_id, so a DuckDB oracle over `documents` verifies
    * the real encode→decode round trip. */
  def featureSummary(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"),
           sum(col("width")).as("sum_width"),
           sum(col("height")).as("sum_height"),
           sum(col("mean_px")).cast("long").as("sum_gray"),
           sum(when(element_at(col("feature"), 1) === 1.0, 1L)
             .otherwise(0L)).as("n_f0"))
}
