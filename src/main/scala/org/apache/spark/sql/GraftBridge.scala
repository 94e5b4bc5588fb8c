package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for package-private Column↔Expression conversion in the
  * classic API (Spark 4 moved Column internals behind ColumnNode). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
