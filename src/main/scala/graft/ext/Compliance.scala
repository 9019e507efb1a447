package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deletion propagation — the right-to-be-forgotten pass every managed
  * data platform runs: given a deletion list of user keys, remove those
  * users' rows from every table that references them and certify the
  * result. The gate's deletion list is deterministic (every user key
  * ≡ 0 mod 37) so the oracle can replay it, but the OPERATOR takes the
  * list as a DataFrame — the production shape.
  *
  * Scale: the deletion list is small relative to the corpus (it is a
  * key set, not a row set) → every removal is a BROADCAST LEFT ANTI
  * join; no fact table ever shuffles. The audit output is 1 row per
  * table: before/deleted/after counts that must reconcile, plus a
  * key-sensitive checksum of the survivors so a wrong row surviving
  * (not just a wrong count) fails the gate.
  */
object Compliance {

  /** Per-table audit of deleting `deleteKeys` (column `del_key`) from
    * the given (table, keyColumn) pairs. */
  def deletionAudit(tables: Seq[(String, DataFrame, String)],
                    deleteKeys: DataFrame): DataFrame = {
    val del = broadcast(deleteKeys)
    tables.map { case (name, df, keyCol) =>
      val kept = df.join(del, df(keyCol) === del("del_key"), "left_anti")
      val total = df.agg(count(lit(1)).as("n_before"))
      kept.agg(count(lit(1)).as("n_after"),
               sum(col(keyCol) % 9973).as("survivor_checksum"))
        .crossJoin(total)
        .select(lit(name).as("table_name"), col("n_before"),
                (col("n_before") - col("n_after")).as("n_deleted"),
                col("n_after"), col("survivor_checksum"))
    }.reduce(_ unionByName _)
  }

  /** Gate: forget every user with key ≡ 0 (mod 37) across the three
    * user-keyed tables (customer rows, their orders, their events). */
  def forgetUsersGate(spark: SparkSession, dir: String,
                      mod: Int = 37): DataFrame = {
    val keys = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("del_key"))
      .filter(col("del_key") % mod === 0)
    deletionAudit(Seq(
      ("customer", Tables.load(spark, dir, "customer"), "c_custkey"),
      ("orders", Tables.load(spark, dir, "orders"), "o_custkey"),
      ("events", Tables.load(spark, dir, "events"), "user_id")), keys)
  }

  def forgetUsersGateOracleSql(mod: Int = 37): String = {
    def one(table: String, key: String) =
      s"""SELECT '$table' AS table_name,
         |  (SELECT count(*) FROM $table) AS n_before,
         |  (SELECT count(*) FROM $table WHERE $key IN
         |     (SELECT c_custkey FROM customer WHERE c_custkey % $mod = 0))
         |    AS n_deleted,
         |  count(*) AS n_after,
         |  CAST(sum($key % 9973) AS BIGINT) AS survivor_checksum
         |FROM $table WHERE $key NOT IN
         |  (SELECT c_custkey FROM customer WHERE c_custkey % $mod = 0)"""
        .stripMargin
    Seq(one("customer", "c_custkey"), one("orders", "o_custkey"),
        one("events", "user_id")).mkString("\nUNION ALL\n")
  }
}
