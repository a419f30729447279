package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `CollectTopK` (declared package-private here): the bounded
  * top-k TypedImperativeAggregate behind the pandas-API nsmallest /
  * nlargest — per-mapper state is a BoundedPriorityQueue of ≤ num
  * elements, partials merge associatively. Same pattern as
  * GraftSqlBridge for the Column constructors.
  */
object GraftAggBridge {
  /** `reverse = true` keeps the num SMALLEST by the child's ordering. */
  def collectTopK(child: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(child, num, reverse).toAggregateExpression()
}
