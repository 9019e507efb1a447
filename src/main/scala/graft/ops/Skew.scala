package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins and aggregations.
  *
  * AQE's skew-join split handles most skew at runtime (sort-merge joins
  * whose partitions exceed the skew threshold are subdivided); salting is
  * the explicit fallback for the cases AQE cannot fix — a hash join where
  * ONE key holds a large fraction of all rows, or a skewed aggregation.
  *
  * Salting trades one extra narrow map stage (salt column + small-side
  * explode) for an n-way spread of every hot key across partitions. The
  * salt is derived from row content (xxhash64), NOT `rand()` — task
  * retries re-evaluate rows, and a nondeterministic salt would let one
  * row land on two different partitions across attempts.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, with the large side's hot keys
    * spread over `salts` sub-keys. The small side is replicated `salts`
    * times (explode) — keep it the genuinely smaller input. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // right/full outer would emit each unmatched small row `salts` times
    // (the small side is exploded), and the key+salt usingColumns join
    // cannot express a cross join at all; only large-side-preserving
    // equi-joins are correct under salting
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
                "leftsemi", "left_anti", "leftanti")
              .contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    // salt from a hash of the whole row: identical rows share a salt, so
    // a hot key whose rows are all identical will not spread — salt on a
    // varying column subset (or add a row-number) in that case
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salts))
        .cast("int"))
    val expanded = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(expanded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skewed aggregation: two-phase partial/final over a salted key.
    * Phase 1 aggregates (key, salt) — hot keys split n ways — phase 2
    * merges the per-salt partials. `partials` are (aggName → partial
    * column builder); only algebraic aggregates (sum/count/min/max)
    * compose this way. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_" + valueCol))
  }

  /** Join-key skew profile — the DIAGNOSIS that decides when the salted
    * operators above (or AQE skew-join) are worth their overhead: the
    * per-key row-count distribution of the big join/group keys, reduced
    * to (distinct keys, max, p50, p99, mean). `max_n / mean_n` is the
    * skew ratio a planner alarm triggers on. One (key)-keyed count per
    * profiled column, then a bounded aggregation over the per-key
    * counts; exact interpolated percentiles (both engines use the R-7
    * definition). */
  def keySkewProfile(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame =
    Seq(("lineitem", "l_orderkey"), ("events", "user_id"))
      .map { case (t, k) =>
        graft.Tables.load(spark, dir, t)
          .groupBy(col(k)).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_keys"), max(col("n")).as("max_n"),
               round(expr("percentile(n, 0.5)"), 4).as("p50_n"),
               round(expr("percentile(n, 0.99)"), 4).as("p99_n"),
               round(avg(col("n")), 4).as("mean_n"))
          .select(lit(t).as("tbl"), lit(k).as("key_col"), col("n_keys"),
                  col("max_n"), col("p50_n"), col("p99_n"), col("mean_n"))
      }.reduce(_ unionByName _)

  def keySkewProfileOracleSql(): String =
    Seq(("lineitem", "l_orderkey"), ("events", "user_id"))
      .map { case (t, k) =>
        s"""SELECT '$t' AS tbl, '$k' AS key_col,
           |  count(*) AS n_keys, CAST(max(n) AS BIGINT) AS max_n,
           |  round(quantile_cont(n, 0.5), 4) AS p50_n,
           |  round(quantile_cont(n, 0.99), 4) AS p99_n,
           |  round(avg(n), 4) AS mean_n
           |FROM (SELECT $k, count(*) AS n FROM $t GROUP BY 1) c"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
}
