package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stride-scheduled curriculum order (q112): determinism, the schedule
  * invariants, and proportional-share convergence — the property that
  * makes stride scheduling a mixture schedule rather than a shuffle. */
class MixtureOrderSpec extends SparkSpec {

  test("schedule is deterministic and positions are a clean 1..k") {
    val a = Sampling.mixtureOrder(spark, sfDir, k = 50).collect()
    val b = Sampling.mixtureOrder(spark, sfDir, k = 50).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.map(_.getLong(0)).toSeq == (1L to 50L))
    // vtime nondecreasing along the schedule
    val vt = a.sortBy(_.getLong(0)).map(_.getDouble(3))
    assert(vt.zip(vt.tail).forall { case (x, y) => x <= y })
  }

  test("prefix shares track the source weights") {
    // weights: srcN -> N % 3 + 1. Over a prefix long enough to cycle,
    // a weight-3 source must appear ~3x as often as a weight-1 source.
    val rows = Sampling.mixtureOrder(spark, sfDir, k = 120).collect()
    val bySource = rows.groupBy(_.getString(2)).view.mapValues(_.length)
    val w = (s: String) => s.drop(3).toInt % 3 + 1
    val byWeight = bySource.toSeq.groupBy { case (s, _) => w(s) }
      .view.mapValues(g => g.map(_._2).sum.toDouble / g.size).toMap
    // per-source mean appearances by weight class; ratios ~1:2:3
    assert(byWeight(3) > byWeight(1) * 2.0,
      s"weight-3 sources under-scheduled: $byWeight")
    assert(byWeight(2) > byWeight(1) * 1.3,
      s"weight-2 sources under-scheduled: $byWeight")
  }

  test("within a source, documents appear in seeded md5 order") {
    val rows = Sampling.mixtureOrder(spark, sfDir, k = 120).collect()
      .sortBy(_.getLong(0))
    rows.groupBy(_.getString(2)).foreach { case (_, rs) =>
      // vtime = r / w with fixed w per source: ascending vtime within a
      // source means ascending per-source rank r
      val vts = rs.sortBy(_.getLong(0)).map(_.getDouble(3))
      assert(vts.zip(vts.tail).forall { case (x, y) => x < y })
    }
  }
}
