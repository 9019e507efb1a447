package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Change-data-capture MERGE: apply a changeset of whole-row upserts and
  * deletes to a snapshot — the lakehouse staple (`MERGE INTO` semantics
  * with whole-row replacement), which open-source Spark only ships inside
  * table formats; here it is a plain two-operator composition any sink
  * can use.
  *
  * result = (snapshot ANTI-JOIN change keys) UNION (upsert rows):
  * one key-shuffled anti-join plus a union — rows untouched by the
  * changeset never move, upserts replace matched rows and insert
  * unmatched ones, deletes simply vanish. At 100 TB the snapshot side is
  * the big one and the changeset the small one, so the anti-join
  * broadcasts (or bucket-joins) the change keys; cost is one pass over
  * the snapshot regardless of changeset composition — the CDC-apply
  * plan every compaction job runs. */
object Cdc {

  /** Apply `changes` to `snapshot`. `changes` must carry the snapshot's
    * columns plus an `op` column ∈ {"upsert", "delete"}; an upsert
    * replaces the whole row for its key (or inserts it), a delete
    * removes the key. Later wins within a changeset is NOT resolved here
    * — feed one change per key (the compacted-changelog contract). */
  def merge(snapshot: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val changeKeys = changes.select(col(key))
    val upserts = changes.filter(col("op") === "upsert").drop("op")
    snapshot.join(changeKeys, Seq(key), "left_anti")
      .unionByName(upserts)
  }

  /** Gate entry: a deterministic changeset over `customer` — updates
    * (+100 balance) for custkey % 7 = 0, deletes for custkey % 11 = 3,
    * inserts (key + max(c_custkey)) for custkey % 13 = 5 — applied via
    * [[merge]]. Every rule is arithmetic on the key, so the oracle
    * reconstructs the exact post-merge table. Insert keys offset by the
    * table's own max key (a broadcast 1-row aggregate, no driver
    * action), so they can never collide with a live key at ANY scale
    * factor — a fixed offset would collide once the table outgrows it
    * and the merge would silently drop the original row. */
  def customerMerge(spark: SparkSession, dir: String): DataFrame = {
    val snap = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
              round(col("c_acctbal"), 2).as("bal"))
    val maxKey = snap.agg(max(col("c_custkey")).as("maxk"))
    val updates = snap.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_name"),
              round(col("bal") + 100.0, 2).as("bal"),
              lit("upsert").as("op"))
    val deletes = snap.filter(col("c_custkey") % 11 === 3)
      .select(col("c_custkey"), col("c_name"), col("bal"),
              lit("delete").as("op"))
    val inserts = snap.filter(col("c_custkey") % 13 === 5)
      .crossJoin(broadcast(maxKey))
      .select((col("c_custkey") + col("maxk")).as("c_custkey"),
              concat(lit("new_"), col("c_name")).as("c_name"),
              lit(0.0).as("bal"), lit("upsert").as("op"))
    merge(snap, updates.unionByName(deletes).unionByName(inserts),
          "c_custkey")
  }

  val customerMergeOracleSql: String =
    """WITH snap AS (
      |  SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
      |  FROM customer)
      |SELECT c_custkey, c_name,
      |  CASE WHEN c_custkey % 7 = 0 THEN round(bal + 100.0, 2)
      |       ELSE bal END AS bal
      |FROM snap
      |WHERE NOT (c_custkey % 11 = 3 AND c_custkey % 7 <> 0)
      |UNION ALL
      |SELECT c_custkey + (SELECT max(c_custkey) FROM snap),
      |  'new_' || c_name, 0.0
      |FROM snap WHERE c_custkey % 13 = 5""".stripMargin

  /** Latest-wins key compaction — the primitive under every upsert log
    * and CDC table: of all records per key, keep exactly the newest
    * (by event time, id as the total-order tiebreak). Implemented as a
    * `max_by` over a struct ordered (ts, event_id, …) — ONE shuffle
    * with map-side partial maxima (each partition forwards one
    * candidate row per key), never a per-key window sort: at 100 TB
    * the difference between shuffling one row per (key, partition) and
    * sort-materializing every key's full history.
    *
    * Gate keys: (user_id, event_type) over events — "each user's most
    * recent event of each type", the serving-store projection. */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("value")),
        struct(col("ts"), col("event_id"))).as("r"))
      .select(col("user_id"), col("event_type"),
              col("r.ts").as("ts"), col("r.event_id").as("event_id"),
              col("r.value").as("value"))

  def latestPerKeyOracleSql(): String =
    """SELECT user_id, event_type, ts, event_id, value
      |FROM (SELECT user_id, event_type, ts, event_id, value,
      |        row_number() OVER (PARTITION BY user_id, event_type
      |                           ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1""".stripMargin
}
