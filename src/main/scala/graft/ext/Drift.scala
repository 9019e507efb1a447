package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Distribution-drift detection — the two-sample Kolmogorov–Smirnov
  * statistic between the `value` distributions of two event types,
  * computed EXACTLY in integers: at every distinct value v,
  * `|F1(v) − F2(v)|` is compared via the cross-multiplied form
  * `|cum1·N2 − cum2·N1|` (BIGINT, no float ECDFs), so the argmax and
  * the statistic are bit-deterministic and DuckDB-replayable.
  *
  * This is the data-quality monitor a training pipeline runs between
  * corpus refreshes ("did the quality-score / length / price
  * distribution move?") — no reference counterpart.
  *
  * Scale: one shuffle keyed on `value` folds the corpus to the distinct
  * -value table (map-side combine; N rows → |support| rows). The
  * cumulative sums are windowed over THAT bounded table — the same
  * discipline as the q126 length-curriculum rank: the only ordered
  * window runs on the (bounded) support, never the corpus. For an
  * unbounded-support column, pre-quantize values to a grid (the KS
  * statistic of the quantized ECDFs bounds the true one within one grid
  * cell of mass).
  */
object Drift {

  /** Gate: KS drift between two event types' value distributions.
    * Output (one row): sample sizes, the exact integer KS numerator
    * (max |cum1·N2 − cum2·N1|), the statistic (numerator / N1·N2,
    * rounded to 6), and the smallest value attaining the max. */
  def ksDrift(spark: SparkSession, dir: String,
              typeA: String = "click", typeB: String = "purchase")
      : DataFrame = {
    val support = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L))
             .as("c1"),
           sum(when(col("event_type") === typeB, 1L).otherwise(0L))
             .as("c2"))
    // bounded-support cumulative sums (see scaladoc) + global totals
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = support
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
    val totals = support.agg(sum(col("c1")).as("n1"),
                             sum(col("c2")).as("n2"))
    val d = cum.crossJoin(broadcast(totals))
      .withColumn("d", abs(col("cum1") * col("n2") -
                           col("cum2") * col("n1")))
    val maxD = d.agg(max(col("d")).as("ks_num"))
    // argmin-value at the max: 1-row broadcast back onto the support
    d.join(broadcast(maxD), col("d") === col("ks_num"))
      .groupBy(col("n1"), col("n2"), col("ks_num"))
      .agg(min(col("value")).as("at_value"))
      .withColumn("ks_stat",
        round(col("ks_num").cast("double") /
              (col("n1").cast("double") * col("n2").cast("double")), 6))
      .select(col("n1"), col("n2"), col("ks_num"), col("ks_stat"),
              col("at_value"))
  }

  def ksDriftOracleSql(typeA: String = "click",
                       typeB: String = "purchase"): String =
    s"""WITH support AS (
       |  SELECT value,
       |    CAST(sum(CASE WHEN event_type = '$typeA' THEN 1 ELSE 0 END)
       |         AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN event_type = '$typeB' THEN 1 ELSE 0 END)
       |         AS BIGINT) AS c2
       |  FROM events WHERE event_type IN ('$typeA', '$typeB')
       |  GROUP BY value),
       |cum AS (
       |  SELECT value,
       |    CAST(sum(c1) OVER (ORDER BY value
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
       |    CAST(sum(c2) OVER (ORDER BY value
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2,
       |    CAST((SELECT sum(c1) FROM support) AS BIGINT) AS n1,
       |    CAST((SELECT sum(c2) FROM support) AS BIGINT) AS n2
       |  FROM support),
       |d AS (SELECT *, abs(cum1 * n2 - cum2 * n1) AS d FROM cum)
       |SELECT n1, n2, CAST(max(d) AS BIGINT) AS ks_num,
       |  round(CAST(max(d) AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6)
       |    AS ks_stat,
       |  min(CASE WHEN d = (SELECT max(d) FROM d) THEN value END)
       |    AS at_value
       |FROM d GROUP BY n1, n2""".stripMargin
}
