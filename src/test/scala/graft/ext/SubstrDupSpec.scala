package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ExactSubstr-style positional duplication: hand-built corpora with
  * known shared runs, internal consistency on the real corpus. */
class SubstrDupSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: Seq[(Long, String)], k: Int = 8) =
    SubstrDup.substrDupStatsDf(rows.toDF("doc_id", "text"), k)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap

  test("a shared 10-token run at k=8 yields 3 dup windows and run 10") {
    val shared = (1 to 10).map(i => s"shared$i").mkString(" ")
    val a = s"$shared alpha beta gamma delta epsilon zeta eta theta"
    val b = s"iota kappa lambda mu nu xi omicron pi $shared"
    val out = stats(Seq((1L, a), (2L, b)))
    // doc 1: 18 tokens -> 11 windows; positions 0..2 covered by the run
    assert(out(1L)._1 == 11)
    assert(out(1L)._2 == 3)
    assert(out(1L)._4 == 10) // 3 consecutive dup windows + k - 1
    // doc 2: run sits at the tail; same 3 windows, same max run
    assert(out(2L)._2 == 3)
    assert(out(2L)._4 == 10)
  }

  test("a window repeated only WITHIN one doc is not duplication") {
    val run = (1 to 8).map(i => s"w$i").mkString(" ")
    val a = s"$run filler1 filler2 filler3 filler4 filler5 filler6 filler7 $run"
    val out = stats(Seq((1L, a), (2L, "totally different words here with no overlap at all")))
    assert(out(1L)._2 == 0)
    assert(out(1L)._4 == 0)
  }

  test("disjoint dup runs report the LONGEST run") {
    val r1 = (1 to 9).map(i => s"a$i").mkString(" ")   // 9-token run
    val r2 = (1 to 12).map(i => s"b$i").mkString(" ")  // 12-token run
    val sep = (1 to 8).map(i => s"sep$i").mkString(" ")
    val a = s"$r1 $sep $r2"
    val b = s"$r1 other tokens entirely unrelated $r2"
    val out = stats(Seq((1L, a), (2L, b)))
    assert(out(1L)._4 == 12)
    assert(out(2L)._4 == 12)
  }

  test("plan joins on the gram hash — no cartesian, no nested loop") {
    val plan = SubstrDup.substrDupStats(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("corpus output is internally consistent") {
    val out = SubstrDup.substrDupStats(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_dup_windows") > col("n_windows")).count() == 0)
    assert(out.filter(col("dup_fraction") < 0 || col("dup_fraction") > 1)
      .count() == 0)
    assert(out.filter(
      (col("n_dup_windows") === 0) =!= (col("max_dup_run_tokens") === 0))
      .count() == 0)
    // a dup run of r windows needs r dup windows: max_run <= n_dup
    assert(out.filter(col("max_dup_run_tokens") =!= 0 &&
      col("max_dup_run_tokens") - 7 > col("n_dup_windows")).count() == 0)
    out.unpersist()
  }

  private def removed(rows: Seq[(Long, String)], k: Int = 8) =
    SubstrDup.substrRemoveDf(rows.toDF("doc_id", "text"), k)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("removal deletes exactly the covered span, nothing else") {
    val shared = (1 to 10).map(i => s"shared$i").mkString(" ")
    val tailA = "alpha beta gamma delta epsilon zeta eta theta"
    val headB = "iota kappa lambda mu nu xi omicron pi"
    val out = removed(Seq((1L, s"$shared $tailA"), (2L, s"$headB $shared")))
    // doc 1: the 10 shared tokens are covered; the 8-token tail survives
    assert(out(1L) == ((18L, 10L, tailA)))
    // doc 2: head survives, shared tail removed
    assert(out(2L) == ((18L, 10L, headB)))
  }

  test("removal: doc shorter than k and non-dup doc pass through") {
    val short = "only three tokens"
    val uniq = "completely unrelated vocabulary with nine distinct fresh words"
    val other = "some other doc that shares nothing with either of them"
    val out = removed(Seq((1L, short), (2L, uniq), (3L, other)))
    assert(out(1L) == ((3L, 0L, short)))
    assert(out(2L)._2 == 0L && out(2L)._3 == uniq)
  }

  test("removal: identical docs are emptied entirely") {
    val t = (1 to 12).map(i => s"t$i").mkString(" ")
    val out = removed(Seq((1L, t), (2L, t)))
    assert(out(1L) == ((12L, 12L, "")))
    assert(out(2L) == ((12L, 12L, "")))
  }

  test("removal conserves tokens on the real corpus") {
    val out = SubstrDup.substrRemove(spark, sfDir).cache()
    assert(out.count() > 0)
    // survivors in clean_text = n_tokens - n_removed, for every doc
    val survived = when(col("clean_text") === "", 0L)
      .otherwise(size(split(col("clean_text"), " ")).cast("long"))
    assert(out.filter(survived =!= col("n_tokens") - col("n_removed"))
      .count() == 0)
    // the audit and the rewrite share a detection basis: a doc removes
    // tokens iff q89 reports dup windows on it
    val audit = SubstrDup.substrDupStats(spark, sfDir)
      .select(col("doc_id"), col("n_dup_windows"))
    assert(out.join(audit, "doc_id")
      .filter((col("n_removed") > 0) =!= (col("n_dup_windows") > 0))
      .count() == 0)
    out.unpersist()
  }
}
