package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** BPE merge training (q213) against an independent in-memory trainer:
  * same tokenization, same greedy left-to-right merge, same
  * (count desc, pair asc) tie-break. */
class BpeMergesSpec extends SparkSpec {

  // 10 merges crosses the trainer's fold-chain materialization
  // boundary (cap 4) twice — the equality test certifies the rebase
  // does not change a single learned merge
  private val NMerges = 10

  /** Reference trainer on the collected vocabulary. */
  private def model(): Seq[(Long, String, String, Long)] = {
    val vocab: Map[String, Long] = Tables.load(spark, sfDir, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).toLowerCase
        .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
        .split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    var syms: Map[Vector[String], Long] =
      vocab.groupBy(_._1.split("").toVector).map { case (s, ws) =>
        s -> ws.values.sum
      }
    (1 to NMerges).flatMap { t =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, n) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      if (counts.isEmpty) None
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        syms = syms.groupBy { case (s, _) =>
          s.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          }
        }.map { case (s, ws) => s -> ws.values.sum }
        Some((t.toLong, l, r, c))
      }
    }
  }

  test("learned merges equal the reference trainer's, step for step") {
    val got = TextAnalysis.bpeMerges(spark, sfDir, NMerges)
      .collect().map(r => (r.getAs[Long]("step"), r.getAs[String]("lhs"),
                           r.getAs[String]("rhs"), r.getAs[Long]("n_occ")))
      .sortBy(_._1).toSeq
    assert(got == model())
  }

  test("merged symbols grow: a later merge can consume an earlier one") {
    // with enough steps some merge's lhs or rhs is itself multi-char —
    // the property that distinguishes a TRAINER from pair counting
    val deep = TextAnalysis.bpeMerges(spark, sfDir, 12)
      .collect().map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    assert(deep.exists { case (l, r) => l.length > 1 || r.length > 1 },
      s"no compound merge in 12 steps: ${deep.mkString(", ")}")
  }
}
