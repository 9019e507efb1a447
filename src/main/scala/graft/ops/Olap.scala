package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-level aggregation operators beyond the reference surface
  * (SURVEY.md §2.5 family): ROLLUP / CUBE / GROUPING SETS / PIVOT and
  * exact per-group percentiles.
  *
  * Scale notes: rollup/cube/grouping-sets compile to Catalyst's Expand +
  * partial-aggregate plan — one shuffle keyed on (group cols,
  * grouping-id), map-side combined, so the multi-level aggregation costs
  * one pass regardless of level count. Pivot is a bounded-width
  * conditional aggregation (the value list is explicit — never inferred
  * by a driver-side distinct scan at 100 TB). Exact percentile
  * materializes each group's values (fine for bounded group counts like
  * return flags); unbounded-cardinality groups should use
  * approx_percentile(t-digest) instead — both are exposed.
  *
  * All gates emit exact integers or exact integer-valued double sums
  * (l_quantity is integral), so DuckDB oracle hashes are bit-stable.
  */
object Olap {

  /** ROLLUP (l_returnflag, l_linestatus): per-pair, per-flag, grand
    * total — the hierarchy roll-up. NULL marks rolled-up levels, same as
    * ANSI. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity")).as("sum_l_quantity"))

  /** CUBE (l_returnflag, l_linestatus): every subset of the grouping
    * columns. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity")).as("sum_l_quantity"))

  /** Explicit GROUPING SETS — the general form rollup/cube desugar to
    * (per-flag, per-status, grand total; never the pair). Spark exposes
    * it in SQL only, so the operator registers a view and uses the SQL
    * form — same Expand plan as rollup/cube. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("olap_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       sum(l_quantity) AS sum_l_quantity
        |FROM olap_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
        .stripMargin)
  }

  /** The event-type universe pivoted into columns. Explicit value list:
    * pivot with an inferred list needs a driver-side distinct scan —
    * never acceptable on an unbounded stream of event types. */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT: hourly event counts, one column per event type. Single
    * shuffle on the hour; the pivot itself is a conditional count
    * (codegen'd), width bounded by the explicit type list. */
  def pivotHourlyTypes(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.load(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    // absent (hour, type) combos pivot to NULL; the gate wants exact 0s
    pivoted.select(col("h") +:
      EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
  }

  /** Exact per-group percentiles (median, p90) of l_quantity.
    * l_quantity is integral, and both engines interpolate quantiles with
    * the same (n-1)·q rule, so the exact values are bit-identical. (The
    * 100 TB path for unbounded group cardinalities is
    * `approx_percentile` — a mergeable t-digest-style sketch — but its
    * output is engine-specific, so the gate hashes the exact form.) */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.5)).as("p50"),
           percentile(col("l_quantity"), lit(0.9)).as("p90"))

  /** Per-group second-moment statistics — mean / sample variance /
    * stddev of quantity and the quantity↔price correlation — computed
    * the only way a distributed engine can make them engine-exact:
    * accumulate the five raw sums (Σx, Σy, Σx², Σy², Σxy) in DECIMAL
    * (exact, order-independent — float sums differ run-to-run with
    * partial-aggregation order), then evaluate the closed-form moments
    * in double with an expression tree mirrored verbatim in the oracle.
    * `sqrt` is IEEE correctly-rounded, so the doubles are bit-identical;
    * outputs are still DECIMAL-quantized for belt-and-braces.
    *
    * Scale: one shuffle, map-side combined — the textbook one-pass
    * moments pattern (vs. naive two-pass mean-then-deviation). Spark's
    * own var_samp/corr use float partial sums (order-dependent in the
    * last ulps); this is the reproducible-pipeline variant, equality
    * within 1e-9 of the built-ins spec-asserted. */
  def momentStats(spark: SparkSession, dir: String): DataFrame = {
    val sums = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
              // DECIMAL(19,4) on BOTH engines (oracle matches): DuckDB
              // needs width >= 19 so the multiply runs in int128 (an
              // int64-backed DECIMAL(18,4) square overflows at runtime),
              // and Spark's (19,4)x(19,4) product type decimal(38,7) is
              // exact here because the doubles carry <= 2 real fractional
              // digits, so every product has <= 4.
              col("l_quantity").cast("decimal(19,4)").as("x"),
              col("l_extendedprice").cast("decimal(19,4)").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(col("x")).as("sx"), sum(col("y")).as("sy"),
           sum(col("x") * col("x")).as("sxx"),
           sum(col("y") * col("y")).as("syy"),
           sum(col("x") * col("y")).as("sxy"))
    val nD  = col("n").cast("double")
    val sx  = col("sx").cast("double");  val sy  = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    def quant(c: org.apache.spark.sql.Column) =
      c.cast("decimal(28,10)").cast("double")
    val varX = (nD * sxx - sx * sx) / (nD * (nD - lit(1.0)))
    // Degenerate groups are pinned to NULL SYMMETRICALLY with the oracle:
    // n = 1 makes sample variance 0/0 (a double Inf/NaN that Spark's
    // decimal cast nulls but DuckDB's raises on), and a zero variance
    // makes corr 0/0 — so both engines short-circuit before dividing.
    val ssX = nD * sxx - sx * sx
    val ssY = nD * syy - sy * sy
    sums.select(
      col("l_returnflag"), col("n"),
      quant(sx / nD).as("mean_qty"),
      quant(sy / nD).as("mean_price"),
      quant(when(col("n") > 1, varX)).as("var_qty"),
      quant(when(col("n") > 1, sqrt(varX))).as("std_qty"),
      quant(when(col("n") > 1 && ssX > 0.0 && ssY > 0.0,
                 (nD * sxy - sx * sy) / (sqrt(ssX) * sqrt(ssY))))
        .as("corr_qty_price"))
  }

  def momentStatsOracleSql: String =
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(x) AS sx, sum(y) AS sy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      |  FROM (SELECT l_returnflag,
      |          CAST(l_quantity AS DECIMAL(19,4)) AS x,
      |          CAST(l_extendedprice AS DECIMAL(19,4)) AS y
      |        FROM lineitem)
      |  GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  CAST(CAST(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS DECIMAL(28,10)) AS DOUBLE) AS mean_qty,
      |  CAST(CAST(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS DECIMAL(28,10)) AS DOUBLE) AS mean_price,
      |  CAST(CAST(CASE WHEN n > 1 THEN
      |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) END
      |    AS DECIMAL(28,10)) AS DOUBLE) AS var_qty,
      |  CAST(CAST(CASE WHEN n > 1 THEN
      |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) END
      |    AS DECIMAL(28,10)) AS DOUBLE) AS std_qty,
      |  CAST(CAST(CASE WHEN n > 1
      |      AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
      |      AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0 THEN
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END
      |    AS DECIMAL(28,10)) AS DOUBLE) AS corr_qty_price
      |FROM s""".stripMargin
}
