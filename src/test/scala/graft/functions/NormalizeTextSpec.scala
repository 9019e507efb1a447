package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** NormalizeText must be value-identical to the regex chain it
  * replaces — checked on generated strings (ASCII + unicode + edge
  * whitespace) and on the real documents corpus. */
class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  private def regexForm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  test("equals the regex chain on generated strings") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', '.', ',', '!', '@'),
      Gen.oneOf('É', 'ü', 'ß', '中', '✓', 'İ'))).map(_.mkString)
    val samples = (1 to 200).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))) ++ Seq(
      "", " ", "  a  b  ", "ALL CAPS", "..!!..", "a", "ÀÉÎÕÜ", "İstanbul")
    val df = samples.toDF("s")
      .select(NormalizeText.normalize(col("s")).as("fast"),
              regexForm(col("s")).as("slow"))
    val diff = df.filter(col("fast") =!= col("slow")).collect()
    assert(diff.isEmpty, s"diverged: ${diff.take(5).toSeq}")
  }

  test("equals the regex chain on the documents corpus") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(NormalizeText.normalize(col("text")).as("fast"),
              regexForm(col("text")).as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("interpreted eval matches codegen result") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString(
      "  Hello, WORLD!  123  ✓ çü  ")
    val viaHelper = NormalizeText.normalize(s).toString
    val viaPlan = Seq("  Hello, WORLD!  123  ✓ çü  ").toDF("s")
      .select(NormalizeText.normalize(col("s"))).as[String].head()
    assert(viaHelper == viaPlan)
    // ✓, ç, ü are outside [a-z0-9 ] → spaces → collapsed away
    assert(viaPlan == "hello world 123")
  }
}
