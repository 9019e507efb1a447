package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANALYZE-style column stats: values match direct recomputation and
  * the scan is one pruned pass per table. */
class TableStatsSpec extends SparkSpec {

  test("columnStats matches direct per-column recomputation") {
    val got = TableStats.columnStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.size == 7)
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val direct = li.agg(count(lit(1)), countDistinct(col("l_orderkey")),
        min(col("l_orderkey")).cast("double"),
        max(col("l_orderkey")).cast("double")).head()
    assert(got(("lineitem", "l_orderkey")) ==
      ((direct.getLong(0), direct.getLong(1),
        direct.getDouble(2), direct.getDouble(3))))
    // every column of a table reports the same row count
    assert(got.keys.filter(_._1 == "lineitem")
      .map(k => got(k)._1).toSet.size == 1)
    // min <= max everywhere
    got.values.foreach { case (_, _, mn, mx) => assert(mn <= mx) }
  }

  test("priceHistogram: counts sum to the table, buckets tile the range") {
    val h = TableStats.priceHistogram(spark, sfDir).cache()
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    assert(h.agg(sum("n")).head.getLong(0) == li.count())
    val rows = h.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.forall { case (b, n, lo, hi) => n > 0 && lo <= hi && b < 16 })
    // buckets are disjoint and ordered
    rows.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // every value falls inside its bucket's bounds
    val joined = li.select(round(col("l_extendedprice") * 100)
        .cast("long").as("c"))
      .crossJoin(h.select(min("lo_cents").as("gmin"), max("hi_cents")
        .as("gmax")))
      .filter(col("c") < col("gmin") || col("c") > col("gmax"))
    assert(joined.count() == 0)
    h.unpersist()
  }

  test("stats scan reads only the profiled columns (pruned ReadSchema)") {
    val plan = TableStats.columnStats(spark, sfDir)
      .queryExecution.executedPlan.toString
    // lineitem has 11 columns; the stats pass must not read the rest
    assert(!plan.contains("l_shipdate"), "unprofiled column in scan")
    assert(!plan.contains("l_returnflag"), "unprofiled column in scan")
  }
}
