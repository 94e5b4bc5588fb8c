package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for package-private Column↔Expression conversion in the
  * classic API (Spark 4 moved Column internals behind ColumnNode), and
  * for wrapping a hand-built LogicalPlan back into a DataFrame. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** Stable unique id for the session's lifetime (private[sql] upstream). */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID
}
