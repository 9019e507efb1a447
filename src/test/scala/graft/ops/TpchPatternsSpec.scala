package graft.ops

import graft.SparkSpec

/** Plan-shape assertions for the TPC-H-pattern gates: the POINT of
  * q178–q187 is that Catalyst decorrelates the subquery forms into
  * joins — these specs pin the rewritten shapes so a regression back
  * to a nested-loop (or a filter that stops pushing) fails loudly. */
class TpchPatternsSpec extends SparkSpec {

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("Q4/Q21 EXISTS decorrelates to semi/anti joins, never a nested loop") {
    val waiting = physical(TpchPatterns.waitingOrders(spark, sfDir))
    assert(waiting.contains("LeftSemi"),
      s"EXISTS must plan a left semi join:\n$waiting")
    val blocking = physical(TpchPatterns.blockingSuppliers(spark, sfDir))
    assert(blocking.contains("LeftSemi") && blocking.contains("LeftAnti"),
      s"EXISTS + NOT EXISTS must plan semi + anti joins:\n$blocking")
    for (p <- Seq(waiting, blocking))
      assert(!p.contains("CartesianProduct"),
        s"no cartesian in a decorrelated plan:\n$p")
  }

  test("Q16 NOT IN plans a null-aware anti join against the flagged set") {
    val p = physical(TpchPatterns.supplierCensus(spark, sfDir))
    assert(p.contains("LeftAnti"), s"NOT IN must plan an anti join:\n$p")
  }

  test("Q22 threshold + NOT EXISTS: anti join, subqueries evaluated once") {
    val p = physical(TpchPatterns.dormantCustomers(spark, sfDir))
    assert(p.contains("LeftAnti"),
      s"NOT EXISTS must plan an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("Q2 correlated min becomes an aggregate join, not a re-scan") {
    val df = TpchPatterns.minCostSupplier(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    // decorrelation = the min is computed ONCE as a keyed aggregate
    // and joined back on the correlation key
    assert(opt.contains("min("),
      s"expected a decorrelated min aggregate:\n$opt")
    val p = physical(df)
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"correlated scalar subquery must not nested-loop:\n$p")
  }

  test("Q6 pushes the scan-bound predicates into the parquet reader") {
    // toString truncates PushedFilters — formatted explain prints the
    // full list
    val p = TpchPatterns.revenueBand(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(p.contains("PushedFilters") &&
           p.contains("GreaterThanOrEqual(l_discount") &&
           p.contains("LessThan(l_quantity"),
      s"Q6's predicates must reach the scan:\n$p")
    assert(p.contains("ReadSchema: struct<l_quantity:double," +
                      "l_extendedprice:double,l_discount:double," +
                      "l_shipdate:timestamp_ntz>"),
      s"Q6 must read exactly the four needed columns:\n$p")
  }

  test("Q17 correlated avg decorrelates like Q2's min") {
    val df = TpchPatterns.smallQtyRevenue(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("avg("),
      s"expected a decorrelated avg aggregate:\n$opt")
    val p = physical(df)
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"correlated avg subquery must not nested-loop:\n$p")
  }

  test("Q19 pushes each side's disjunction implications to its scan") {
    val p = TpchPatterns.disjunctiveRevenue(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    // Catalyst extracts per-side implications of the cross-table OR:
    // the part scan must carry the brand disjunction, the lineitem
    // scan the quantity-band union — neither side may scan unfiltered
    assert(p.contains("Brand#12"),
      s"part scan must receive the brand disjunction:\n$p")
    val liFilter = p.linesIterator
      .filter(_.contains("l_quantity")).mkString("\n")
    assert(liFilter.nonEmpty,
      s"lineitem side must receive the quantity-band filter:\n$p")
  }

  test("Q13 keeps zero-order customers via the ON-condition filter") {
    import org.apache.spark.sql.functions._
    val dist = TpchPatterns.orderCountDist(spark, sfDir)
    val nCust = graft.Tables.load(spark, sfDir, "customer").count()
    val total = dist.agg(sum(col("custdist"))).head.getLong(0)
    assert(total == nCust,
      "every customer must appear in exactly one count bucket " +
        s"(got $total of $nCust — a WHERE-instead-of-ON would drop " +
        "zero-order customers)")
  }
}
