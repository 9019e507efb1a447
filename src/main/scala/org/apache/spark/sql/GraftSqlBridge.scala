package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions (the Spark
  * 4.x sql/api split hid the old `new Column(expr)` constructor). This is
  * the conventional extension-point shim: public Catalyst Expressions are
  * a supported extension surface, only the Column wrapper is package-
  * private. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply collected injectFunction entries to a LIVE session (the
    * supported path is withExtensions at build time; this covers
    * registering into an already-built session, e.g. shared test
    * sessions). */
  def registerInto(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry)
}
