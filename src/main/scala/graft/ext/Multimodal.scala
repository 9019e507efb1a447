package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed per-partition.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic fake (see [[FakeCodec]]); everything
  * Spark-side is real and tested: the schema (binary payload + metadata
  * struct), partition-batched processing via `mapPartitions` on a typed
  * `Dataset` (the Scala analog of mapInPandas' batch shape — one iterator
  * per partition, constant memory), and the explode-style frame sampler.
  *
  * At 100 TB: payloads stay in executors end-to-end (no driver collect);
  * decode parallelism = partition count; feature vectors are fixed-width
  * arrays so downstream joins/aggs are columnar.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte],
                      format: String, width: Int, height: Int)

  case class MediaFeatures(media_id: Long, format: String,
                           n_bytes: Long, mean_byte: Double,
                           feature: Array[Double])

  /** STUB decoder — deterministic fake standing in for a real codec
    * (libjpeg/ffmpeg are not in this container). Derives "pixels" from
    * payload bytes so tests are reproducible. The Spark plumbing around
    * it (schema, batching, partitioning) is the real deliverable. */
  object FakeCodec {
    /** "Decode" a payload into an 8-bucket byte histogram feature. */
    def decodeToFeature(payload: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](8)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xFF) >> 5) += 1.0
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < 8) { hist(j) /= payload.length; j += 1 }
      }
      hist
    }
  }

  /** Build a media table from `documents`: payload = utf-8 bytes of the
    * text (a stand-in for real image bytes), metadata derived
    * deterministically. Demonstrates the binary-column schema. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"))

  /** Decode + feature-extract, batched per partition. Typed Dataset →
    * mapPartitions: the iterator never materializes a partition in
    * memory, matching mapInPandas' batch contract. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val feat = FakeCodec.decodeToFeature(r.payload)
        val mean =
          if (r.payload.length == 0) 0.0
          else r.payload.map(b => (b & 0xFF).toDouble).sum / r.payload.length
        MediaFeatures(r.media_id, r.format, r.payload.length.toLong, mean, feat)
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

  /** Queryable summary for the driver gate: per-format feature stats.
    * (Registered rows-only — the fake decode is not SQL-expressible.) */
  def featureSummary(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"),
           round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
           round(avg(element_at(col("feature"), 1)), 4).as("avg_f0"))
}
