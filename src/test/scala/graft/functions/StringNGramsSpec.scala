package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StringNGrams vs the transform/slice/concat_ws formulation it replaces
  * — must be value-identical (it only changes evaluation cost). */
class StringNGramsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two three four",
    "a b c d",    // exactly 4 words -> one 4-gram
    "x y z",      // fewer than 4 words -> zero 4-grams
    "dup dup dup dup dup"
  ).toDF("text").select(split(col("text"), " ").as("words"))

  test("4-grams equal concat_ws(' ', slice(...)) of each window, in order") {
    val got = docs.select(
      StringNGrams.ngrams(col("words"), 4).as("mine"),
      // sequence(1, 0) is DESCENDING in Spark, so guard the short-doc case
      expr("""CASE WHEN size(words) < 4 THEN array()
             |ELSE transform(sequence(1, size(words) - 3),
             |  i -> concat_ws(' ', slice(words, i, 4))) END"""
        .stripMargin).as("builtin")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("n=1 yields the words themselves") {
    val got = docs.select(col("words"),
      StringNGrams.ngrams(col("words"), 1).as("mine")).collect()
    got.foreach { r => assert(r.getSeq[String](0) == r.getSeq[String](1)) }
  }

  private lazy val registered: Unit = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftSqlBridge.registerInto(ext, spark)
  }

  test("registered SQL function agrees with the Column API") {
    registered
    val got = docs.select(
      StringNGrams.ngrams(col("words"), 2).as("mine"),
      expr("string_ngrams(words, 2)").as("viaSql")).collect()
    got.foreach { r => assert(r.getSeq[String](0) == r.getSeq[String](1)) }
  }
}
