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
}
