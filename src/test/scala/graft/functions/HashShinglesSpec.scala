package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HashShingles / SortedIntersectCount vs the built-in expressions they
  * replace — must be value-identical (they only change evaluation cost). */
class HashShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two three four",
    "a b c",      // exactly 3 words -> one 3-shingle
    "x y",        // fewer than 3 words -> zero 3-shingles
    "dup dup dup dup"
  ).toDF("text").select(split(col("text"), " ").as("words"))

  test("3-gram hashes equal xxhash64(concat_ws(' ', slice(...))) of each window") {
    val got = docs.select(
      HashShingles.shingles(col("words"), 3).as("mine"),
      // sequence(1, 0) is DESCENDING in Spark, so guard the short-doc case
      expr("""CASE WHEN size(words) < 3 THEN array()
             |ELSE array_sort(array_distinct(transform(
             |  sequence(1, size(words) - 2),
             |  i -> xxhash64(concat_ws(' ', slice(words, i, 3)))))) END"""
        .stripMargin).as("builtin")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("word hashes (n=1, no dedupe) equal transform(words, xxhash64), in order") {
    val got = docs.select(
      HashShingles.wordHashes(col("words")).as("mine"),
      expr("transform(words, w -> xxhash64(w))").as("builtin")).collect()
    got.foreach { r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)) }
  }

  test("dedupe output is sorted distinct; multiset output keeps duplicates") {
    val r = Seq("dup dup other dup").toDF("text")
      .select(split(col("text"), " ").as("words"))
      .select(HashShingles.shingles(col("words"), 1).as("set"),
              HashShingles.wordHashes(col("words")).as("all"))
      .head()
    assert(r.getSeq[Long](0).size == 2)
    assert(r.getSeq[Long](0) == r.getSeq[Long](0).sorted)
    assert(r.getSeq[Long](1).size == 4)
  }

  test("md5 shingles equal conv(substr(md5(gram), 1, 15), 16, 10)") {
    // the oracle-reproducibility contract: the kernel's 60-bit value IS
    // the first 15 hex chars of the standard md5 hex form
    val got = docs.select(
      HashShingles.md5Shingles(col("words"), 3).as("mine"),
      expr("""CASE WHEN size(words) < 3 THEN array()
             |ELSE array_sort(array_distinct(transform(
             |  sequence(1, size(words) - 2),
             |  i -> cast(conv(substring(md5(concat_ws(' ', slice(words, i, 3))),
             |                 1, 15), 16, 10) AS LONG)))) END"""
        .stripMargin).as("builtin")).collect()
    got.foreach { r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)) }
  }

  test("md5 word hashes: hex halves of md5(word) are the long's two halves") {
    // compare per half (a signed-64 rebuild of the top half would
    // overflow under ANSI); hi = bits 63..32, lo = bits 31..0
    val base = docs.select(col("words"),
      HashShingles.md5WordHashes(col("words")).as("hs"))
    val rows = base.select(
      expr("transform(hs, h -> shiftrightunsigned(h, 32))").as("mine_hi"),
      expr("transform(hs, h -> h & 4294967295L)").as("mine_lo"),
      expr("transform(words, w -> cast(conv(substring(md5(w), 1, 8), 16, 10) AS LONG))")
        .as("oracle_hi"),
      expr("transform(words, w -> cast(conv(substring(md5(w), 9, 8), 16, 10) AS LONG))")
        .as("oracle_lo")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](2))
      assert(r.getSeq[Long](1) == r.getSeq[Long](3))
    }
  }

  test("md5 parity holds on generated word lists (property)") {
    // the md5 kernels are the oracle-reproducibility contract for the
    // minhash/simhash/winnow gates — fuzz it beyond the fixed corpus:
    // random word shapes incl. empty strings, unicode, repeats
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genWord = Gen.frequency(
      6 -> Gen.alphaNumStr.map(_.take(10)),
      1 -> Gen.const(""),
      1 -> Gen.oneOf("déjà", "näive", "文字", "a b", "-"),
      1 -> Gen.const("dup"))
    val docsGen = Gen.listOfN(
      120, Gen.chooseNum(0, 9).flatMap(n => Gen.listOfN(n, genWord)))
    val rows = docsGen.pureApply(Gen.Parameters.default, Seed(7L))
      .map(ws => Tuple1(ws.toArray))
    val df = rows.toDF("words")
    val got = df.select(
      HashShingles.md5Shingles(col("words"), 3).as("mine3"),
      expr("""CASE WHEN size(words) < 3 THEN array()
             |ELSE array_sort(array_distinct(transform(
             |  sequence(1, size(words) - 2),
             |  i -> cast(conv(substring(md5(concat_ws(' ', slice(words, i, 3))),
             |                 1, 15), 16, 10) AS LONG)))) END"""
        .stripMargin).as("oracle3"),
      HashShingles.md5WordHashes(col("words")).as("mine1"),
      col("words"))
      .withColumn("o_hi", expr(
        "transform(words, w -> cast(conv(substring(md5(w), 1, 8), 16, 10) AS LONG))"))
      .withColumn("o_lo", expr(
        "transform(words, w -> cast(conv(substring(md5(w), 9, 8), 16, 10) AS LONG))"))
      .withColumn("m_hi", expr("transform(mine1, h -> shiftrightunsigned(h, 32))"))
      .withColumn("m_lo", expr("transform(mine1, h -> h & 4294967295L)"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](6) == r.getSeq[Long](4)) // m_hi == o_hi
      assert(r.getSeq[Long](7) == r.getSeq[Long](5)) // m_lo == o_lo
    }
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted arrays") {
    val pairs = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 5L, 10L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array.empty[Long], Array(1L)),
      (Array(7L), Array(7L))
    ).toDF("a", "b")
    val got = pairs.select(
      SortedIntersectCount.sortedIntersectCount(col("a"), col("b")).as("mine"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    got.foreach { r => assert(r.getInt(0) == r.getInt(1)) }
  }

  test("interpreted eval matches codegen for both expressions") {
    // force interpreted path by evaluating the expression directly
    val words = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("aa", "bb", "cc", "dd").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    val viaEval =
      HashShingles.compute(words, 3, dedupe = true, HashShingles.AlgoXx64)
    val viaDf = Seq("aa bb cc dd").toDF("t")
      .select(HashShingles.shingles(split(col("t"), " "), 3)).head().getSeq[Long](0)
    assert(viaEval.toLongArray().toSeq == viaDf)
  }
}
