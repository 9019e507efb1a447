package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H-pattern gates over the subquery shapes the rest of the gate
  * suite doesn't stress: correlated EXISTS / NOT EXISTS, NOT IN,
  * IN-subquery semi joins, and scalar-subquery thresholds — the
  * generalization of the reference's correlated scalar subqueries
  * (`/root/reference/src/queryplan/mod.rs:735-757`), expressed on the
  * full TPC-H-ish schema (no partsupp/commitdate/shipmode columns in
  * the testdata, so Q2/Q4/Q12/Q16/Q21/Q22 are adapted to the columns
  * that exist, keeping each query's PLAN SHAPE intact).
  *
  * The subquery-shaped gates run through `spark.sql` ON PURPOSE: the
  * point is Catalyst's decorrelation (RewritePredicateSubquery and
  * friends), so the gate hands Catalyst the raw subquery and the spec
  * asserts the rewritten join shape — EXISTS → LeftSemi, NOT IN →
  * null-aware LeftAnti, correlated scalar → aggregate-then-join.
  * Each such gate executes its ORACLE string verbatim
  * (`spark.sql(xOracleSql())` — the SQL is dialect-common), so
  * gate == oracle holds by construction and a threshold tweak cannot
  * drift one side silently. The plain join/agg patterns
  * (Q6/Q12/Q13/Q14) use the DataFrame API like every other relational
  * gate, with a separately-maintained oracle.
  *
  * 100 TB notes per gate at the definition site; common discipline:
  * money math in DECIMAL (exact, order-independent), one double cast
  * at the output edge, broadcast dimension joins, no driver collects.
  */
object TpchPatterns {

  private val tpchTables =
    Seq("lineitem", "orders", "customer", "supplier", "part")

  /** Run a dialect-common oracle TEMPLATE against DIR-SCOPED temp
    * views: each TPC-H table is registered as `<name>_g<sha1(dir)>`
    * and the template interpolates table names through `t(...)`, so
    * the gate GENERATES the SQL with the scoped names directly — no
    * textual rewrite of finished SQL (a \b-regex rename would corrupt
    * an oracle that used a table name as a column alias, inside a
    * string literal, or in a comment). With `t = identity` the same
    * template yields the plain-table oracle the driver hands DuckDB,
    * so gate == oracle holds by construction. Scoping exists because
    * two gates over different dirs in one session must never read
    * each other's data (plain shared view names raced between
    * createOrReplaceTempView and spark.sql under concurrency). */
  private def scopedSql(spark: SparkSession, dir: String,
                        oracle: (String => String) => String): DataFrame = {
    val tag = java.security.MessageDigest.getInstance("SHA-1")
      .digest(dir.getBytes("UTF-8")).take(10).map(b => f"$b%02x").mkString
    tpchTables.foreach(t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(s"${t}_g$tag"))
    spark.sql(oracle(t => s"${t}_g$tag"))
  }

  // ---- Q2 shape: correlated-min scalar subquery ---------------------

  /** TPC-H Q2-style min-cost lookup (adapted: no partsupp, so the
    * "cheapest offer" is the minimum sale price in lineitem): for each
    * small SMALL-type part, the supplier(s) that sold it at its global
    * minimum price. Catalyst decorrelates the correlated `min` into a
    * per-partkey aggregate joined back on the correlation key — at
    * 100 TB that is one map-side-combined aggregate over lineitem plus
    * one co-keyed join, NOT a per-part re-scan (the reference's
    * nested-loop model). Ties (two suppliers at the min price) emit
    * both rows — a deterministic set either way. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    scopedSql(spark, dir, minCostSupplierOracleSql)
  }

  def minCostSupplierOracleSql(t: String => String = identity): String =
    s"""SELECT p_partkey, p_name, s_name,
      |  CAST(l_extendedprice AS DOUBLE) AS min_price
      |FROM ${t("part")} p
      |JOIN ${t("lineitem")} l ON l.l_partkey = p.p_partkey
      |JOIN ${t("supplier")} s ON s.s_suppkey = l.l_suppkey
      |WHERE p.p_size < 10 AND p.p_type = 'SMALL'
      |  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
      |                           FROM ${t("lineitem")} l2
      |                           WHERE l2.l_partkey = p.p_partkey)""".stripMargin

  // ---- Q4 shape: correlated EXISTS ----------------------------------

  /** TPC-H Q4-style waiting-orders count (adapted: no commitdate, so
    * "waiting" = some line shipped more than 90 days after the order
    * date): per priority, orders of 1997 with at least one late line.
    * The correlated EXISTS decorrelates to a LEFT SEMI join of orders
    * against lineitem on orderkey with the date predicate as a join
    * condition — semi-join output is bounded by the orders side, and
    * lineitem never duplicates orders (the trap a manual inner-join
    * rewrite would hit). */
  def waitingOrders(spark: SparkSession, dir: String): DataFrame = {
    scopedSql(spark, dir, waitingOrdersOracleSql)
  }

  def waitingOrdersOracleSql(t: String => String = identity): String =
    s"""SELECT o_orderpriority, count(*) AS order_count
      |FROM ${t("orders")} o
      |WHERE year(o_orderdate) = 1997
      |  AND EXISTS (SELECT 1 FROM ${t("lineitem")} l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  // ---- Q6 shape: scan-bound predicate aggregate ---------------------

  /** TPC-H Q6-style forecasting-revenue band: one filtered scan, one
    * global aggregate, zero joins — the query whose entire cost is the
    * parquet read, so the plan MUST show the year/discount/quantity
    * filters pushed to the scan and only two columns in ReadSchema.
    * Revenue = Σ price·discount in DECIMAL (2dp × 2dp → exact 4dp;
    * order-independent), one double cast at the edge. */
  def revenueBand(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1997 &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * " +
                    "CAST(l_discount AS DECIMAL(18,2))"))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))

  def revenueBandOracleSql(): String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE year(l_shipdate) = 1997
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---- Q12 shape: CASE-conditional counting agg ---------------------

  /** TPC-H Q12-style priority census (adapted: no shipmode, so the
    * grouping is returnflag): per flag, how many 1997-shipped lines
    * belong to critical-priority orders vs not. The CASE folds into
    * the aggregate (conditional count = sum of 0/1 ints — map-side
    * combinable); the only shuffle is the lineitem⋈orders fact join
    * on the co-partitionable orderkey. */
  def priorityLines(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1997)
      .select(col("l_orderkey"), col("l_returnflag"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  def priorityLinesOracleSql(): String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE year(l_shipdate) = 1997
      |GROUP BY l_returnflag""".stripMargin

  // ---- Q13 shape: outer-join count distribution ---------------------

  /** TPC-H Q13-style customer order-count distribution: LEFT join so
    * zero-order customers survive as c_count = 0, then the double
    * aggregate (per-customer count → distribution over counts). The
    * filter ON the join condition (not WHERE — WHERE would turn the
    * outer join inner) is the pattern being certified. First agg
    * shuffles on custkey; the distribution agg is bounded by distinct
    * counts (≤ max orders per customer). */
  def orderCountDist(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer").select(col("c_custkey"))
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select(col("o_custkey"), col("o_orderkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  def orderCountDistOracleSql(): String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin

  // ---- Q14 shape: conditional revenue ratio -------------------------

  /** TPC-H Q14-style promo share for one month: promo revenue over
    * total revenue. Both sums accumulate the SAME exact-decimal rev
    * column (conditional vs unconditional) in one aggregate pass, so
    * the ratio is one double division of two order-independent exact
    * values. part is broadcast; lineitem is pruned to the month at
    * the scan. */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("l_partkey"),
              expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")
                .as("rev"))
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_type"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(
             lit(0).cast("decimal(18,4)"))).cast("double")
             .as("promo_revenue"),
           sum(col("rev")).cast("double").as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
              round(lit(100.0) * col("promo_revenue") / col("total_revenue"),
                    4).as("promo_pct"))
  }

  def promoShareOracleSql(): String =
    """SELECT promo_revenue, total_revenue,
      |  round(100.0 * promo_revenue / total_revenue, 4) AS promo_pct
      |FROM (
      |  SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
      |                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |      AS promo_revenue,
      |    CAST(sum(rev) AS DOUBLE) AS total_revenue
      |  FROM (SELECT l_partkey,
      |          CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
      |            AS rev
      |        FROM lineitem
      |        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      |          AND l_shipdate < TIMESTAMP '1997-10-01') l
      |  JOIN part ON l_partkey = p_partkey) t""".stripMargin

  // ---- Q16 shape: NOT IN anti join ----------------------------------

  /** TPC-H Q16-style supplier census (adapted: supplier "complaints"
    * = negative account balance): distinct suppliers per (brand, size)
    * for selected sizes, excluding flagged suppliers via NOT IN.
    * Catalyst plans the NOT IN as a null-aware LeftAnti against the
    * tiny flagged-supplier set (broadcast) — at 100 TB the exclusion
    * costs one broadcast lookup per row, and the distinct-count
    * aggregate is the only shuffle. */
  def supplierCensus(spark: SparkSession, dir: String): DataFrame = {
    scopedSql(spark, dir, supplierCensusOracleSql)
  }

  def supplierCensusOracleSql(t: String => String = identity): String =
    s"""SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM ${t("lineitem")} JOIN ${t("part")} ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO' AND p_size IN (1, 9, 19, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM ${t("supplier")}
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size""".stripMargin

  // ---- Q18 shape: IN aggregate-HAVING subquery ----------------------

  /** TPC-H Q18-style large-volume orders: orders whose total quantity
    * exceeds 300, with customer and per-order totals. The IN-subquery
    * (GROUP BY + HAVING) decorrelates to a semi join against the
    * aggregated key set; quantities are integral doubles so the sums
    * are exact and order-independent. At 100 TB: the HAVING filter
    * shrinks the semi-join build side to the handful of jumbo orders
    * (broadcastable), and the outer join chain is key-co-partitioned. */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    scopedSql(spark, dir, largeOrdersOracleSql)
  }

  def largeOrdersOracleSql(t: String => String = identity): String =
    s"""SELECT c_name, c_custkey, o_orderkey,
      |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      |  CAST(sum(l_quantity) AS DOUBLE) AS total_qty
      |FROM ${t("customer")} JOIN ${t("orders")} ON c_custkey = o_custkey
      |JOIN ${t("lineitem")} ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM ${t("lineitem")}
      |                     GROUP BY l_orderkey
      |                     HAVING sum(l_quantity) > 300)
      |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice""".stripMargin

  // ---- Q21 shape: EXISTS + NOT EXISTS pair --------------------------

  /** TPC-H Q21-style sole-blocker census (adapted: no receipt/commit
    * dates, so "at fault" = the only supplier with a RETURNED line on
    * a finished multi-supplier order): per supplier, how many orders
    * it alone blocked. BOTH correlated subqueries decorrelate to
    * joins on l_orderkey — a semi join (some other supplier exists on
    * the order) and an anti join (no other supplier returned) — so
    * the plan is three co-keyed joins over lineitem, not a per-row
    * re-scan; output is bounded by #suppliers. */
  def blockingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    scopedSql(spark, dir, blockingSuppliersOracleSql)
  }

  def blockingSuppliersOracleSql(t: String => String = identity): String =
    s"""SELECT s_name, count(*) AS numwait
      |FROM ${t("supplier")}
      |JOIN ${t("lineitem")} l1 ON s_suppkey = l1.l_suppkey
      |JOIN ${t("orders")} ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM ${t("lineitem")} l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM ${t("lineitem")} l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name""".stripMargin

  // ---- Q17 shape: correlated-avg threshold --------------------------

  /** TPC-H Q17-style small-quantity revenue: lines whose quantity is
    * below 20% of their part's average quantity. The correlated `avg`
    * decorrelates to one per-partkey aggregate joined back on the key
    * (same plan family as Q2's min) — at 100 TB one map-side-combined
    * agg over lineitem, not a per-part re-scan. Exactness: quantities
    * are integral doubles, so `avg` is one IEEE division of exact
    * values and `0.2 * avg` is bit-identical in both engines; the
    * revenue sum is exact DECIMAL. */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    scopedSql(spark, dir, smallQtyRevenueOracleSql)
  }

  def smallQtyRevenueOracleSql(t: String => String = identity): String =
    s"""SELECT count(*) AS n_lines,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS small_qty_revenue
      |FROM ${t("lineitem")} l JOIN ${t("part")} p ON l.l_partkey = p.p_partkey
      |WHERE p.p_type = 'SMALL'
      |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
      |                      FROM ${t("lineitem")} l2
      |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  // ---- Q15 shape: argmax via scalar subquery over a derived agg -----

  /** TPC-H Q15-style top supplier: supplier(s) whose quarterly revenue
    * equals the maximum. The derived per-supplier revenue table is
    * bounded (#suppliers) and referenced twice — once joined, once
    * under `max` — and the equality is on an exact-decimal-derived
    * double, so ties (all suppliers at the max) surface exactly in
    * both engines. Lineitem is pruned to the quarter at the scan. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    scopedSql(spark, dir, topSupplierOracleSql)
  }

  def topSupplierOracleSql(t: String => String = identity): String =
    s"""WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |             AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      |  FROM ${t("lineitem")}
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM ${t("supplier")} JOIN rev ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)"""
      .stripMargin

  // ---- Q19 shape: disjunctive cross-table predicate -----------------

  /** TPC-H Q19-style disjunctive revenue: three (brand, size-band,
    * quantity-band) alternatives OR'd across the join. The pattern
    * certifies Catalyst's disjunction handling: each side's common
    * implications are extracted and PUSHED (part's scan gets the
    * brand/size disjunction, lineitem's the quantity-band union —
    * spec-asserted), so the join sees pre-filtered inputs instead of
    * evaluating the OR over the full cross product. */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    scopedSql(spark, dir, disjunctiveRevenueOracleSql)
  }

  def disjunctiveRevenueOracleSql(t: String => String = identity): String =
    s"""SELECT count(*) AS n_lines,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |           AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM ${t("lineitem")} JOIN ${t("part")} ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ---- Q22 shape: scalar-subquery threshold + NOT EXISTS ------------

  /** TPC-H Q22-style dormant high-balance customers (adapted: every
    * customer has SOME order, so "dormant" = nothing since 2000):
    * per market segment, customers above the positive-balance mean
    * with no recent orders. The mean threshold uses the
    * CROSS-MULTIPLIED exact form — `bal · n > Σbal` over DECIMAL —
    * because an avg() of doubles differs in the last ULP between
    * engines (summation order) and a threshold ULP flips membership;
    * cross-multiplication keeps every comparison exact in both. The
    * NOT EXISTS decorrelates to an anti join on custkey against the
    * date-pruned orders scan. */
  def dormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    scopedSql(spark, dir, dormantCustomersOracleSql)
  }

  def dormantCustomersOracleSql(t: String => String = identity): String =
    s"""SELECT c_mktsegment, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    AS totacctbal
      |FROM ${t("customer")} c
      |WHERE CAST(c_acctbal AS DECIMAL(18,2))
      |      * (SELECT count(*) FROM ${t("customer")} WHERE c_acctbal > 0.0)
      |    > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
      |       FROM ${t("customer")} WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM ${t("orders")} o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c_mktsegment""".stripMargin
}
