package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank: hand-built graphs with known structure, mass
  * bounds, determinism. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] =
    PageRank.dupPagerank(pairs.toDF("a_id", "b_id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star graph: the hub outranks the leaves, leaves are equal") {
    val out = ranks(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) > out(2L))
    assert(out(2L) == out(3L) && out(3L) == out(4L))
  }

  test("a symmetric pair has equal ranks summing near the scaled mass") {
    val out = ranks(Seq((7L, 9L)))
    assert(out(7L) == out(9L))
    // exact for the 2-cycle: each node keeps rank = 0.15e9 + 0.85*rank,
    // fixed point 1e9 reached immediately (deg 1, floor exact)
    assert(out(7L) == 1000000000L)
  }

  test("total rank mass is bounded by the damping identity") {
    val out = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    val n = out.size
    val total = out.values.sum
    // sum(rank') = 0.15*n*S + 0.85*sum(floor terms) <= n*S; and floor
    // loses < 1 unit per (node, iteration), so the total stays within
    // n * (iters + 1) of the exact mass from below
    assert(total <= n * 1000000000L)
    assert(total > n * 1000000000L - n * 4L * 100L)
    assert(out.values.forall(_ > 0))
  }

  test("deterministic across runs and repartitionings") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
    val a = ranks(pairs)
    val b = PageRank.dupPagerank(
      pairs.toDF("a_id", "b_id").repartition(7), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("iteration plan is equi-join + aggregate — no cartesian, no NLJ") {
    import spark.implicits._
    val plan = PageRank.dupPagerank(
        Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("corpus gate output covers exactly the paired docs") {
    val pairs = Dedup.jaccardPairsCached(spark, sfDir, 0.8)
    val out = PageRank.dupPagerank(spark, sfDir)
    val nodes = pairs.select(col("a_id").as("id"))
      .union(pairs.select(col("b_id"))).distinct().count()
    assert(out.count() == nodes)
    assert(out.filter(col("rank") <= 0).count() == 0)
  }

  private def census(pairs: Seq[(Long, Long)]): (Long, Long) = {
    val r = PageRank.dupTriangles(pairs.toDF("a_id", "b_id")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("triangle census on known graphs") {
    // a single triangle: 1 closed, 3 wedges (one per corner)
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == (1L, 3L))
    // a path of length 2: no triangle, one wedge at the middle node
    assert(census(Seq((1L, 2L), (2L, 3L))) == (0L, 1L))
    // K4: C(4,3)=4 triangles; every vertex has degree 3 -> 4*3=12 wedges
    assert(census(Seq((1L, 2L), (1L, 3L), (1L, 4L),
                      (2L, 3L), (2L, 4L), (3L, 4L))) == (4L, 12L))
    // a star: no triangles, C(3,2)=3 wedges at the hub
    assert(census(Seq((1L, 2L), (1L, 3L), (1L, 4L))) == (0L, 3L))
  }

  test("triangle census consistency on the corpus pair set") {
    val (tri, wed) = {
      val r = PageRank.dupTriangles(spark, sfDir).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // every triangle closes three wedges; the bound is structural
    assert(3 * tri <= wed, s"3*$tri > $wed")
    assert(tri >= 0 && wed >= 0)
  }
}
