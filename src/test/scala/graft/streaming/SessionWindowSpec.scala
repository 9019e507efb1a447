package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** Native session_window sessionization (q105/q106): the batch and
  * streaming forms must agree, and — the property the hand-rolled
  * [[Streams.sessionCounts]] deliberately does NOT have (see its
  * ordering contract) — the streaming form must produce the SAME
  * answer when the events arrive split across many micro-batches,
  * because open session windows live in the state store and merge with
  * whatever later batches deliver. */
class SessionWindowSpec extends SparkSpec {

  /** Batch answer restricted to watermark-closed sessions — the append
    * stream's emission contract. */
  private def closedBatchSessions: DataFrame = {
    val all = graft.ext.Events.sessionWindowStats(spark, sfDir)
    val cutoff = Tables.load(spark, sfDir, "events")
      .agg(max(col("ts"))).head().getAs[java.time.LocalDateTime](0)
      .minusHours(2)
    all.filter(col("s_end") < lit(cutoff))
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("session_window merges touching windows: split only at gap > 30 min") {
    import spark.implicits._
    val df = Seq(
      // user 1: middle gap EXACTLY 30 min -> still ONE session (touching
      // windows merge; this is what falsified the >= oracle formulation)
      (1L, "2026-01-01 10:00:00", 1L), (2L, "2026-01-01 10:10:00", 1L),
      (3L, "2026-01-01 10:40:00", 1L),
      // user 2: gap 30 min + 1 s -> two sessions
      (4L, "2026-01-01 10:00:00", 2L), (5L, "2026-01-01 10:30:01", 2L))
      .toDF("event_id", "t", "user_id")
      .withColumn("ts", col("t").cast("timestamp"))
    val out = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s"),
              col("session_window.end").as("e"), col("n"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().sortBy(r => (r._1, r._2.getTime))
    assert(out.map(r => (r._1, r._4)).toSeq ==
      Seq((1L, 3L), (2L, 1L), (2L, 1L)))
    // window end extends gap past the last event
    assert(out.head._3.toString == "2026-01-01 11:10:00.0")
  }

  test("streaming availableNow equals the watermark-closed batch answer") {
    val streamed = Streams.sessionWindowAvailableNow(spark, sfDir)
    assert(canon(streamed) == canon(closedBatchSessions))
    assert(streamed.count() > 0)
  }

  test("multi-batch delivery (one file per trigger) equals single-batch") {
    // split events into 3 contiguous time ranges, one file each, with
    // ascending mtimes so the file source feeds them oldest-first; a
    // session spanning a chunk boundary exists iff the split is real,
    // and the state store must merge it across micro-batches
    val tmp: Path = Files.createTempDirectory("graft_sw_chunks")
    try {
      val ev = Tables.load(spark, sfDir, "events").orderBy("ts", "event_id")
      val n = ev.count()
      val rows = ev.collect()
      val chunks = rows.grouped((n / 3 + 1).toInt).toSeq
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        val part = spark.createDataFrame(
          new java.util.ArrayList(java.util.Arrays.asList(chunk: _*)),
          ev.schema)
        val dir = Files.createTempDirectory("graft_sw_write")
        part.coalesce(1).write.mode("overwrite").parquet(dir.toString)
        val src = Files.list(dir).filter(_.toString.endsWith(".parquet"))
          .findFirst().get()
        val dst = tmp.resolve(s"chunk$i.parquet")
        Files.copy(src, dst)
        dst.toFile.setLastModified(1000000L * (i + 1))
        ()
      }
      val multi = Streams.sessionWindowAvailableNow(
        spark, tmp.toString, maxFilesPerTrigger = Some(1),
        globOverride = Some("chunk*.parquet"))
      assert(canon(multi) == canon(closedBatchSessions))
    } finally {
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
  }
}
