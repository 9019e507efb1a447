package graft.sem

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Value-semantics layer (SURVEY.md §1.5): truthiness, div-by-zero → NULL,
  * concat-as-string, sum-as-double, NaN guard. */
class LlamaSemSpec extends SparkSpec {
  import spark.implicits._

  test("truthyTyped: numbers are true iff non-zero, NULL stays NULL") {
    val df = Seq[(java.lang.Integer, String)](
      (0, "zero"), (1, "one"), (-5, "neg"), (null, "null"))
      .toDF("n", "tag")
    val kept = df.filter(LlamaSem.truthyTyped(col("n"), IntegerType))
      .select("tag").as[String].collect().toSet
    assert(kept == Set("one", "neg")) // 0 false, NULL dropped by filter
  }

  test("truthyTyped: strings are true iff non-empty") {
    val df = Seq(("", "empty"), ("x", "nonempty"), ("0", "zerochar"))
      .toDF("s", "tag")
    val kept = df.filter(LlamaSem.truthyTyped(col("s"), StringType))
      .select("tag").as[String].collect().toSet
    // reference truthiness is length>0, NOT numeric: "0" is true
    assert(kept == Set("nonempty", "zerochar"))
  }

  test("safeDiv: division by zero yields NULL for ints and doubles") {
    val df = Seq((10.0, 0.0), (10.0, 4.0), (7.0, 0.0)).toDF("l", "r")
    val out = df.select(LlamaSem.safeDiv(col("l"), col("r")).as("d"))
      .as[Option[Double]].collect().toSeq
    assert(out == Seq(None, Some(2.5), None)) // never Infinity/NaN
  }

  test("concatSem: both sides rendered as strings, NULL propagates") {
    val df = Seq[(String, java.lang.Integer)](("n=", 42), ("x", null))
      .toDF("l", "r")
    val out = df.select(LlamaSem.concatSem(col("l"), col("r")).as("c"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("n=42"), None))
  }

  test("llamaSum: integer input accumulates as double (reference f64 sum)") {
    val df = Seq(1, 2, 3).toDF("n")
    val row = df.agg(LlamaSem.llamaSum(col("n")).as("s")).collect().head
    assert(row.schema("s").dataType == DoubleType)
    assert(row.getDouble(0) == 6.0)
  }

  test("noNaN: NaN becomes NULL (reference forbids NaN, f64nonan.rs)") {
    val df = Seq(1.5, Double.NaN, 2.5).toDF("x")
    val out = df.select(LlamaSem.noNaN(col("x")).as("x"))
      .as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(1.5), None, Some(2.5)))
  }

  test("bareColumn is deterministic (min) for group-by bare columns") {
    val df = Seq(("a", 3), ("a", 1), ("b", 2)).toDF("k", "v")
    val out = df.groupBy("k").agg(LlamaSem.bareColumn(col("v")).as("v"))
    assertSameRows(out, Seq(Row("a", 1), Row("b", 2)))
  }
}
