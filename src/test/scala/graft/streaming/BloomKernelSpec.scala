package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pure-JVM properties of the Bloom probe-then-set kernel the q206/
  * q207 streaming dedup state is built on — no Spark session needed.
  * The load-bearing guarantee is NO FALSE NEGATIVES: once a key has
  * been inserted, every later probe of the same key reports "seen",
  * for ANY key sequence and ANY filter size. Deterministic-seed
  * sampling (the LlamaSemPropSpec discipline) so failures reproduce. */
class BloomKernelSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): List[A] =
    Gen.listOfN(200, g).pureApply(Gen.Parameters.default, Seed(seed))

  private def fresh(log2Bits: Int) =
    (new Array[Byte](1 << (log2Bits - 3)), (1 << log2Bits) - 1)

  // duplicate-heavy key streams over a small id space + raw longs
  private val genKeys: Gen[List[Long]] = Gen.oneOf(
    Gen.listOfN(300, Gen.chooseNum(-50L, 50L)),
    Gen.listOfN(300, Gen.long))

  test("no false negatives: re-probing an inserted key is always 'seen'") {
    for (seed <- 1L to 20L; log2Bits <- Seq(6, 10, 14)) {
      val keys = sample(genKeys, seed).flatten
      val (bits, mask) = fresh(log2Bits)
      val inserted = scala.collection.mutable.Set.empty[Long]
      keys.foreach { k =>
        val isNew = Streams.bloomCheckAndSet(bits, mask, k)
        assert(!(inserted(k) && isNew),
          s"false negative for $k at log2Bits=$log2Bits seed=$seed")
        inserted += k
      }
      // after the fold every inserted key still probes as seen
      inserted.foreach(k =>
        assert(!Streams.bloomCheckAndSet(bits, mask, k)))
    }
  }

  test("emitted-as-new count never exceeds the distinct key count") {
    for (seed <- 21L to 40L) {
      val keys = sample(genKeys, seed).flatten
      val (bits, mask) = fresh(12)
      val news = keys.count(Streams.bloomCheckAndSet(bits, mask, _))
      assert(news <= keys.distinct.size)
    }
  }

  test("determinism: same key sequence, same accept/reject sequence") {
    for (seed <- 41L to 50L) {
      val keys = sample(genKeys, seed).flatten
      val (b1, m) = fresh(10)
      val (b2, _) = fresh(10)
      assert(keys.map(Streams.bloomCheckAndSet(b1, m, _)) ==
             keys.map(Streams.bloomCheckAndSet(b2, m, _)))
    }
  }
}
