package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Custom Catalyst expression: SimHash64 (codegen + interpreted paths). */
class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  private def simhashOf(hashes: Seq[Long]): Long =
    Seq(Tuple1(hashes)).toDF("hs")
      .select(SimHash64.simhash64(col("hs")).as("sh"))
      .as[Long].head()

  test("single hash: simhash equals the hash itself (all votes from it)") {
    assert(simhashOf(Seq(0x0123456789ABCDEFL)) == 0x0123456789ABCDEFL)
    assert(simhashOf(Seq(-1L)) == -1L)
  }

  test("majority vote per bit") {
    // two votes for bit0=1, one against -> bit0 set; bit1: one for, two
    // against -> clear
    assert(simhashOf(Seq(1L, 1L, 2L)) == 1L)
  }

  test("ties (equal votes) clear the bit") {
    assert(simhashOf(Seq(1L, 0L)) == 0L)
  }

  test("empty array yields 0") {
    assert(simhashOf(Seq.empty) == 0L)
  }

  test("similar token sets land within small Hamming distance") {
    val a = (1 to 100).map(i => s"tok$i")
    val b = a.updated(5, "changed").updated(50, "other") // 2% different
    val df = Seq(("a", a), ("b", b)).toDF("id", "toks")
      .select(col("id"), SimHash64.simhash64(
        expr("transform(toks, t -> xxhash64(t))")).as("sh"))
    val Array(ha, hb) = df.orderBy("id").as[(String, Long)].collect().map(_._2)
    assert(java.lang.Long.bitCount(ha ^ hb) <= 8,
      s"2% token change must stay within 8 bits, got ${java.lang.Long.bitCount(ha ^ hb)}")
  }

  test("interpreted eval matches codegen result") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val hashes = Array(3L, 5L, 9L, -7L)
    val interpreted = SimHash64.compute(ArrayData.toArrayData(hashes))
    assert(simhashOf(hashes.toSeq) == interpreted)
  }
}
