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
}
