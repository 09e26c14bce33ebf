package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** The one sanctioned bridge from a custom Catalyst [[Expression]] to the
  * public [[Column]] API. Spark 4 made `Column(expr)` private[sql]
  * (columns wrap ColumnNodes now), so libraries shipping native
  * expressions need exactly this shim — placed in the `org.apache.spark
  * .sql` package for access, kept to a single one-liner on purpose.
  * Everything else in this project lives under `graft.*` and uses only
  * public API. */
object GraftSql {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
