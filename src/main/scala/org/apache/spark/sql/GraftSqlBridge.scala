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

  /** Spark's internal bounded top-k aggregate (`CollectTopK`, the
    * TypedImperativeAggregate behind the pandas-API nsmallest/nlargest):
    * per-mapper state is a BoundedPriorityQueue of at most `num`
    * elements, partials merge associatively — the min-k semilattice.
    * `reverse = true` keeps the `num` SMALLEST by the child's ordering.
    * `private[sql]`, hence surfaced through this bridge like the Column
    * constructors.
    */
  def collectTopK(c: Column, num: Int, reverse: Boolean): Column =
    classic.ExpressionUtils.column(
      catalyst.expressions.aggregate.GraftAggBridge
        .collectTopK(expression(c), num, reverse))
}
