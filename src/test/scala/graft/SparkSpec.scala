package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (one JVM per `sbt test` fork;
  * getOrCreate dedups across suites so startup cost is paid once). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** Smallest driver-generated scale factor — correctness fixtures. */
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  def sfDir: String = SparkSpec.sfDir

  /** Order-insensitive row-set comparison (the reference guarantees no
    * output order, SURVEY.md §1.2). */
  def assertSameRows(actual: DataFrame, expected: Seq[Row]): Unit = {
    val a = actual.collect().map(_.toString).sorted.toSeq
    val e = expected.map(_.toString).sorted
    assert(a == e, s"\nactual:   $a\nexpected: $e")
  }
}
