package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditDistanceBandRuleSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    val had = spark.experimental.extraOptimizations
      .contains(EditDistanceBandRule)
    if (!had)
      spark.experimental.extraOptimizations ++= Seq(EditDistanceBandRule)
    try f
    finally if (!had)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == EditDistanceBandRule)
  }

  test("rule adds the length-band guard ahead of levenshtein") {
    withRule {
      val df = graft.Tables.load(spark, sfDir, "part")
        .filter(levenshtein(col("p_name"), lit("red widget")) <= 3)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("abs((length(p_name") ||
             optimized.contains("abs((length(p_name"),
        s"band guard missing:\n$optimized")
      // guard sits LEFT of the levenshtein in the And (evaluated first)
      val cond = optimized.linesIterator
        .find(_.contains("levenshtein")).get
      assert(cond.indexOf("abs(") < cond.indexOf("levenshtein"),
        s"band must gate the DP:\n$cond")
    }
  }

  test("session extension supplies the band to plain spark.sql automatically") {
    // The shared test session (like the Verify/Bench gate sessions) is
    // built with spark.sql.extensions=graft.functions.GraftExtensions,
    // which injectOptimizerRule's this rule — NO experimental
    // registration here; the injected rule must fire on its own for a
    // plain SQL query. (Another suite may have left the experimental
    // registration behind — strip it for the duration so the injected
    // path is what's being proven.)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ == EditDistanceBandRule)
    try {
      graft.Tables.load(spark, sfDir, "part")
        .createOrReplaceTempView("ed_band_part")
      val df = spark.sql(
        "SELECT p_partkey FROM ed_band_part " +
        "WHERE levenshtein(p_name, 'red widget') <= 3")
      val cond = df.queryExecution.optimizedPlan.toString.linesIterator
        .find(_.contains("levenshtein"))
        .getOrElse(fail("no levenshtein Filter in optimized plan"))
      assert(cond.contains("abs((length(p_name"),
        s"injected rule must add the band to plain SQL:\n$cond")
      assert(cond.indexOf("abs(") < cond.indexOf("levenshtein"),
        s"band must gate the DP:\n$cond")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("bounded filter is rewritten to the thresholded early-exit DP") {
    withRule {
      def levLine(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.optimizedPlan.toString.linesIterator
          .find(_.contains("levenshtein"))
          .getOrElse(fail("no levenshtein Filter in optimized plan"))
      // <= k: threshold k, compared >= 0
      val le = levLine(graft.Tables.load(spark, sfDir, "part")
        .filter(levenshtein(col("p_name"), lit("red widget")) <= 3))
      assert(le.contains("red widget, Some(3)) >= 0"),
        s"<= k must become levenshtein(a, b, k) >= 0:\n$le")
      // < k: strict bound maps to threshold k-1
      val lt = levLine(graft.Tables.load(spark, sfDir, "part")
        .filter(levenshtein(col("p_name"), lit("red widget")) < 3))
      assert(lt.contains("red widget, Some(2)) >= 0"),
        s"< k must become levenshtein(a, b, k-1) >= 0:\n$lt")
      // and the strict form stays semantically identical
      val plain = graft.Tables.load(spark, sfDir, "part")
        .filter(expr("levenshtein(p_name, 'red widget', 2) >= 0"))
        .collect().map(_.toString).sorted.toSeq
      val ruled = graft.Tables.load(spark, sfDir, "part")
        .filter(levenshtein(col("p_name"), lit("red widget")) < 3)
        .collect().map(_.toString).sorted.toSeq
      assert(plain == ruled)
    }
  }

  test("an unrelated length guard does not suppress the band") {
    withRule {
      // the user's own abs(length(p_name) - length(p_type)) guard is
      // over a DIFFERENT pair — it implies nothing about the gap
      // between p_name and the literal, so the band must still be
      // added for the levenshtein pair
      val df = graft.Tables.load(spark, sfDir, "part")
        .filter(abs(length(col("p_name")) - length(col("p_type"))) <= 50 &&
                levenshtein(col("p_name"), lit("red widget")) <= 3)
      val cond = df.queryExecution.optimizedPlan.toString.linesIterator
        .find(_.contains("levenshtein"))
        .getOrElse(fail("no levenshtein Filter in optimized plan"))
      // two abs guards: the user's + the rule's band (length(p_name)
      // against the folded literal 10)
      assert("abs\\(".r.findAllIn(cond).length == 2,
        s"band must be added despite the unrelated guard:\n$cond")
    }
  }

  test("an unrelated length-vs-constant guard does not suppress the band") {
    withRule {
      // abs(length(p_name) - 5) <= 100 mentions a levenshtein operand
      // but 5 is NOT the folded length of 'red widget' (10) — it's a
      // user predicate about p_name alone, so the rule must still add
      // its own band for the levenshtein pair
      val df = graft.Tables.load(spark, sfDir, "part")
        .filter(abs(length(col("p_name")) - 5) <= 100 &&
                levenshtein(col("p_name"), lit("red widget")) <= 3)
      val cond = df.queryExecution.optimizedPlan.toString.linesIterator
        .find(_.contains("levenshtein"))
        .getOrElse(fail("no levenshtein Filter in optimized plan"))
      assert("abs\\(".r.findAllIn(cond).length == 2,
        s"band must be added despite the constant guard:\n$cond")
      // and the true folded residue (literal 10 = length('red widget'))
      // still counts as a band: idempotent, exactly one band added
      val plan = df.queryExecution.optimizedPlan
      assert(EditDistanceBandRule(plan) fastEquals plan,
        "rule must be a fixpoint on its own folded output")
    }
  }

  test("rule is semantically transparent and idempotent") {
    val plain = graft.Tables.load(spark, sfDir, "part")
      .filter(levenshtein(col("p_name"), lit("blue bolt")) <= 4)
      .collect().map(_.toString).sorted.toSeq
    val ruled = withRule {
      graft.Tables.load(spark, sfDir, "part")
        .filter(levenshtein(col("p_name"), lit("blue bolt")) <= 4)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(plain == ruled)
    // idempotent: applying the rule to its own output adds nothing
    withRule {
      val plan = graft.Tables.load(spark, sfDir, "part")
        .filter(levenshtein(col("p_name"), lit("blue bolt")) <= 4)
        .queryExecution.optimizedPlan
      val once = EditDistanceBandRule(plan)
      val twice = EditDistanceBandRule(once)
      assert(once fastEquals twice)
      val bands = "abs\\(".r.findAllIn(once.toString).length
      assert(bands == 1, s"exactly one band guard, got $bands:\n$once")
    }
  }
}
