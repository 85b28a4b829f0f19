package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor for [[CollectTopK]] (it is `private[aggregate]`): Spark's
  * bounded-priority-queue collect — one k-item heap per group, map-side
  * combinable, the engine's own top-k primitive (used by its
  * ReplaceHashWithSortAgg/limit pushdowns). */
object GraftCollectBridge {
  def collectTopK(child: Expression, k: Int, reverse: Boolean): Expression =
    CollectTopK(child, k, reverse).toAggregateExpression()
}
