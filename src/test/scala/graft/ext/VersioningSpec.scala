package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersioningSpec extends SparkSpec {

  test("diff statuses partition both snapshots exactly") {
    val diff = Versioning.snapshotDiff(spark, sfDir).cache()
    val byStatus = diff.groupBy("status")
      .agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val docs = graft.Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    val nRemoved = docs.filter(col("doc_id") % 13 === 0).count()
    val nChanged = docs.filter(col("doc_id") % 13 === 1).count()
    val nAdded = docs.filter(col("doc_id") % 13 === 2).count()

    assert(byStatus("removed") == nRemoved)
    assert(byStatus("changed") == nChanged)
    assert(byStatus("added") == nAdded)
    // v1 = removed + changed + unchanged
    assert(byStatus("unchanged") == n - nRemoved - nChanged)
    diff.unpersist(); ()
  }

  test("checksum is id-sensitive: statuses carry disjoint id sums") {
    // the same doc must never contribute to two statuses — total
    // checksum equals the sum over v1 ids plus the added ids
    val diff = Versioning.snapshotDiff(spark, sfDir)
    val total = diff.agg(sum("id_checksum")).collect()(0).getLong(0)
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val v1Sum = docs.agg(sum(col("doc_id") % 9973))
      .collect()(0).getLong(0)
    // inserts are offset by the table's own max(doc_id) + 1 (round-9
    // collision fix) — mirror that rule here
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val addedSum = docs.filter(col("doc_id") % 13 === 2)
      .agg(sum((col("doc_id") + maxId + 1L) % 9973)).collect()(0).getLong(0)
    assert(total == v1Sum + addedSum)
  }
}
