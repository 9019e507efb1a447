package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  test("incremental merge equals full recompute bit-for-bit") {
    val inc = Incremental.incrementalHourlyGate(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val full = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
             .as("sum_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(inc == full)
  }

  test("merge handles keys present on only one side (monoid identity)") {
    import spark.implicits._
    val a = Seq(("2024-01-01 00:00:00", "click", 2L, BigDecimal("1.50")),
                ("2024-01-01 01:00:00", "view", 1L, BigDecimal("0.25")))
      .toDF("h", "event_type", "n", "sv")
      .select(col("h").cast("timestamp_ntz").as("h"), col("event_type"),
              col("n"), col("sv").cast("decimal(18,2)").as("sv"))
    val b = Seq(("2024-01-01 00:00:00", "click", 3L, BigDecimal("2.50")),
                ("2024-01-01 02:00:00", "error", 4L, BigDecimal("9.00")))
      .toDF("h", "event_type", "n", "sv")
      .select(col("h").cast("timestamp_ntz").as("h"), col("event_type"),
              col("n"), col("sv").cast("decimal(18,2)").as("sv"))
    val merged = Incremental.mergeHourly(a, b)
      .select(col("h").cast("string"), col("event_type"), col("n"),
              col("sv").cast("string"))
      .collect().map(_.toString).toSet
    assert(merged == Set(
      "[2024-01-01 00:00:00,click,5,4.00]",
      "[2024-01-01 01:00:00,view,1,0.25]",
      "[2024-01-01 02:00:00,error,4,9.00]"))
  }
}
