package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface for registering custom Catalyst
  * expressions as Columns — the standard pattern for Spark extension
  * libraries (the classic Column(expr) constructor went private with the
  * Spark 4 Connect refactor).
  */
object GraftSqlBridge {
  def column(e: Expression): Column       = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression   = classic.ExpressionUtils.expression(c)
}
