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

  test("stats scan reads only the profiled columns (pruned ReadSchema)") {
    val plan = TableStats.columnStats(spark, sfDir)
      .queryExecution.executedPlan.toString
    // lineitem has 11 columns; the stats pass must not read the rest
    assert(!plan.contains("l_shipdate"), "unprofiled column in scan")
    assert(!plan.contains("l_returnflag"), "unprofiled column in scan")
  }
}
