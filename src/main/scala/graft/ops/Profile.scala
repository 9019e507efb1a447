package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Column-level data profiling (the Deequ/Great-Expectations staple a
  * pipeline runs on every ingested table): per column, row count,
  * non-null count, distinct count, min and max — computed for all
  * columns in ONE pass via `stack` (unpivot), not one scan per column.
  *
  * Scale: the unpivot is map-side row multiplication by the column
  * count (a Generate — no shuffle), followed by a single aggregate keyed on
  * the column name with map-side partial aggregation; distinct counts
  * shuffle (column, value) pairs. One table scan total regardless of
  * how many columns are profiled — the property that matters when the
  * table is 100 TB and the naive per-column loop would be N scans. */
object Profile {

  /** Profile the given numeric columns of `df` in one pass. Values are
    * profiled as doubles; min/max are exact (no accumulation). */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val stackArgs = cols.map(c => s"'$c', CAST($c AS DOUBLE)")
      .mkString(", ")
    df.select(expr(
        s"stack(${cols.length}, $stackArgs) AS (col_name, v)"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("v")).as("n_nonnull"),
           count_distinct(col("v")).as("n_distinct"),
           min(col("v")).as("min_v"),
           max(col("v")).as("max_v"))
  }

  /** Gate entry: profile lineitem's numeric measure columns. */
  def lineitemProfile(spark: SparkSession, dir: String): DataFrame =
    numericProfile(Tables.load(spark, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  val lineitemProfileOracleSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val branches = cols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS v FROM lineitem")
      .mkString("\n  UNION ALL ")
    s"""WITH u AS (
       |  $branches)
       |SELECT col_name, count(*) AS n_rows,
       |  count(v) AS n_nonnull,
       |  count(DISTINCT v) AS n_distinct,
       |  min(v) AS min_v, max(v) AS max_v
       |FROM u GROUP BY col_name""".stripMargin
  }

  /** Referential-integrity audit — orphan foreign keys across the
    * catalog's FK edges, the constraint check a lake has to RUN because
    * nothing enforces it at write time (parquet has no FKs; llamadb
    * parses but ignores REFERENCES — SURVEY §2.4). Per edge: child
    * rows, orphan rows (no parent), distinct orphan keys, and a
    * key-sensitive checksum of the orphan keys so WHICH keys are
    * orphaned is certified, not just how many.
    *
    * Scale: each edge is one LEFT ANTI against the parent KEY SET —
    * dims broadcast; the two fact-fact edges (lineitem→orders,
    * events→customer) co-partition on the join key. Output is one row
    * per edge. */
  def fkIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, childKey: String,
             parent: DataFrame, parentKey: String,
             broadcastParent: Boolean): DataFrame = {
      val keys0 = parent.select(col(parentKey).as("pk")).distinct()
      val keys = if (broadcastParent) broadcast(keys0) else keys0
      // r16 (guide §2.4): one child scan, not two — the orphan stats
      // and the child total used to be separate aggregates (anti join
      // + a second bare scan) glued by a cross join. A left join
      // against the DISTINCT key set preserves child cardinality, so
      // pk IS NULL marks exactly the anti join's rows (a null child
      // key never matches and is an orphan either way) and one
      // aggregate carries all four columns.
      val orphan = col("pk").isNull
      child.join(keys, child(childKey) === col("pk"), "left_outer")
        .agg(count(lit(1)).as("n_child"),
             sum(when(orphan, 1L).otherwise(0L)).as("n_orphans"),
             countDistinct(when(orphan, col(childKey)))
               .as("n_orphan_keys"),
             coalesce(sum(when(orphan, col(childKey) % 9973)), lit(0L))
               .as("orphan_checksum"))
        .select(lit(name).as("fk_edge"), col("n_child"),
                col("n_orphans"), col("n_orphan_keys"),
                col("orphan_checksum"))
    }
    Seq(
      edge("lineitem.l_orderkey->orders",
           Tables.load(spark, dir, "lineitem"), "l_orderkey",
           Tables.load(spark, dir, "orders"), "o_orderkey", false),
      edge("orders.o_custkey->customer",
           Tables.load(spark, dir, "orders"), "o_custkey",
           Tables.load(spark, dir, "customer"), "c_custkey", true),
      edge("events.user_id->customer",
           Tables.load(spark, dir, "events"), "user_id",
           Tables.load(spark, dir, "customer"), "c_custkey", true),
      edge("customer.c_nationkey->nation",
           Tables.load(spark, dir, "customer"), "c_nationkey",
           Tables.load(spark, dir, "nation"), "n_nationkey", true),
      edge("supplier.s_nationkey->nation",
           Tables.load(spark, dir, "supplier"), "s_nationkey",
           Tables.load(spark, dir, "nation"), "n_nationkey", true),
      edge("nation.n_regionkey->region",
           Tables.load(spark, dir, "nation"), "n_regionkey",
           Tables.load(spark, dir, "region"), "r_regionkey", true)
    ).reduce(_ unionByName _)
  }

  def fkIntegrityOracleSql(): String = {
    def one(edge: String, child: String, ck: String,
            parent: String, pk: String) =
      s"""SELECT '$edge' AS fk_edge,
         |  (SELECT count(*) FROM $child) AS n_child,
         |  count(*) AS n_orphans,
         |  count(DISTINCT $ck) AS n_orphan_keys,
         |  CAST(coalesce(sum($ck % 9973), 0) AS BIGINT)
         |    AS orphan_checksum
         |FROM $child WHERE $ck NOT IN (SELECT $pk FROM $parent)"""
        .stripMargin
    Seq(one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
        one("orders.o_custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
        one("events.user_id->customer", "events", "user_id",
            "customer", "c_custkey"),
        one("customer.c_nationkey->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"),
        one("supplier.s_nationkey->nation", "supplier", "s_nationkey",
            "nation", "n_nationkey"),
        one("nation.n_regionkey->region", "nation", "n_regionkey",
            "region", "r_regionkey")).mkString("\nUNION ALL\n")
  }

  /** Chi-square independence audit between two categorical columns
    * (documents.lang × documents.source) — "is language distribution
    * independent of source?", the statistical sibling of the q142 KS
    * drift test. Each cell's term uses the cross-multiplied form
    * (obs·N − rt·ct)² / (N·rt·ct), with BOTH the diff and the
    * denominator accumulated in DECIMAL(38,0) — an int64 triple
    * product N·rt·ct wraps silently past N ≈ 2×10⁶ rows, decimal is
    * exact to N ≈ 4×10¹² (N³ ≤ 10³⁸) — then ONE double square and ONE
    * double division per cell (identical IEEE ops both engines; the
    * oracle mirrors with HUGEINT). The bounded cell terms accumulate
    * in DECIMAL so the final statistic is order-independent.
    *
    * Scale: one (lang, source) counting shuffle folds the corpus; the
    * contingency table is category-bounded; marginals broadcast. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val cells = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy(col("lang")).agg(sum(col("obs")).as("rt"))
    val colT = cells.groupBy(col("source")).agg(sum(col("obs")).as("ct"))
    val totals = docs.agg(count(lit(1)).as("n"),
                          countDistinct(col("lang")).as("n_lang"),
                          countDistinct(col("source")).as("n_source"))
    cells.join(broadcast(rowT), Seq("lang"))
      .join(broadcast(colT), Seq("source"))
      .crossJoin(broadcast(totals))
      .withColumn("diff",
        (col("obs").cast("decimal(38,0)") * col("n") -
         col("rt").cast("decimal(38,0)") * col("ct")).cast("decimal(38,0)"))
      .withColumn("term",
        (col("diff").cast("double") * col("diff").cast("double")) /
          (col("n").cast("decimal(38,0)") * col("rt") * col("ct"))
            .cast("double"))
      .groupBy(col("n"), col("n_lang"), col("n_source"))
      .agg(count(lit(1)).as("n_cells"),
           round(sum(col("term").cast("decimal(38,18)")).cast("double"), 4)
             .as("chi2"))
      .select(col("n"), col("n_lang"), col("n_source"),
              ((col("n_lang") - 1) * (col("n_source") - 1)).as("dof"),
              col("n_cells"), col("chi2"))
  }

  /** Benford first-digit audit — data-forensics staple: the leading
    * digit of naturally-occurring amounts follows log10(1+1/d); a flat
    * or spiked distribution flags synthetic or tampered data. Digits
    * are string-exact (first char of the integer part — no float log
    * tricks), counts are integers, and the only float ops are one
    * log10 per digit and the frequency divisions, rounded @4dp.
    * Scale: pure map-side digit extraction + bounded 9-row rollup. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.load(spark, dir, "orders")
      .select(substring(floor(col("o_totalprice")).cast("long")
                          .cast("string"), 1, 1).as("digit"))
      .filter(col("digit") =!= "0")
    val n = totals.agg(count(lit(1)).as("n_total"))
    totals.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(n))
      .select(col("digit"), col("n"),
        round(col("n") / col("n_total").cast("double"), 4).as("freq"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 4)
          .as("benford_p"))
  }

  def benfordAuditOracleSql(): String =
    """WITH d AS (
      |  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
      |                     AS VARCHAR), 1, 1) AS digit
      |  FROM orders),
      |d2 AS (SELECT digit FROM d WHERE digit <> '0'),
      |n AS (SELECT count(*) AS n_total FROM d2)
      |SELECT digit, count(*) AS n,
      |  round(count(*) / CAST((SELECT n_total FROM n) AS DOUBLE), 4)
      |    AS freq,
      |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4) AS benford_p
      |FROM d2 GROUP BY digit""".stripMargin

  def chiSquareOracleSql(): String =
    """WITH cells AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
      |  FROM documents GROUP BY lang, source),
      |rt AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS rt
      |       FROM cells GROUP BY lang),
      |ct AS (SELECT source, CAST(sum(obs) AS BIGINT) AS ct
      |       FROM cells GROUP BY source),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(count(DISTINCT lang) AS BIGINT) AS n_lang,
      |        CAST(count(DISTINCT source) AS BIGINT) AS n_source
      |      FROM documents),
      |terms AS (
      |  SELECT n, n_lang, n_source,
      |    CAST(CAST(obs AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct
      |         AS DOUBLE)
      |      * CAST(CAST(obs AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct
      |             AS DOUBLE) /
      |      CAST(CAST(n AS HUGEINT) * rt * ct AS DOUBLE) AS term
      |  FROM cells JOIN rt USING (lang) JOIN ct USING (source)
      |  CROSS JOIN t)
      |SELECT n, n_lang, n_source,
      |  (n_lang - 1) * (n_source - 1) AS dof,
      |  count(*) AS n_cells,
      |  round(CAST(sum(CAST(term AS DECIMAL(38,18))) AS DOUBLE), 4)
      |    AS chi2
      |FROM terms GROUP BY n, n_lang, n_source""".stripMargin
}
