package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PartitionedLayoutSpec extends SparkSpec {

  test("day filter becomes a partition filter: only selected days are read") {
    val scan = PartitionedLayout.prunedScan(spark, sfDir,
      startOffsetDays = 5, days = 7)
    val n = scan.count()
    // correctness: equals the same band filtered from the raw table
    val expected = Tables.load(spark, sfDir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .collect().map(_.getString(0)).sorted
    val days = expected.distinct
    val band = days.slice(5, 12).toSet
    assert(n == expected.count(band.contains))
    // the plan prunes: the day predicate is a PartitionFilter on the
    // scan (planning-time), not a post-scan data Filter
    val planStr = scan.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
           planStr.split("PartitionFilters", 2)(1).take(200).contains("d#"),
      s"expected a partition filter on d:\n$planStr")
    // and the actually-read partition set is exactly the band
    val readDays = scan
      .select(date_format(col("d"), "yyyy-MM-dd")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(readDays == band)
  }

  test("dim-filter join plants a dynamicpruning PartitionFilter on the fact scan") {
    val joined = PartitionedLayout.dynamicPruningJoin(spark, sfDir)
      .select(col("d"), col("event_type"))
    // the Monday set is NOT a literal at planning time — static pruning
    // cannot apply; DPP must plant a runtime subquery filter on the
    // fact scan's partitions
    val p = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n$p")
    // correctness: equals the direct Monday filter over the raw table
    val viaDpp = joined.collect().length
    val direct = Tables.load(spark, sfDir, "events")
      .filter(dayofweek(to_date(date_trunc("day", col("ts")))) === 2)
      .count()
    assert(viaDpp.toLong == direct,
      "DPP join must select exactly the Monday rows")
  }

  test("mergeSchema read reconciles both writer vintages losslessly") {
    val rows = PartitionedLayout.mergeSchemaGate(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    // row conservation across both vintages
    assert(rows.map(_.getLong(2)).sum == docs.count())
    // pre-schema rows are exactly the even ids
    val pre = rows.filter(_.getString(1) == "<pre-schema>")
      .map(_.getLong(2)).sum
    assert(pre == docs.filter(col("doc_id") % 2 === 0).count())
    // evolved rows keep their true lang values
    val evolvedLangs = rows.map(_.getString(1)).distinct.toSet - "<pre-schema>"
    val trueLangs = docs.filter(col("doc_id") % 2 =!= 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(evolvedLangs == trueLangs)
  }
}
