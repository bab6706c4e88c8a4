package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim (the graftbridge pattern): Spark's bounded-heap top-k
  * aggregate `CollectTopK` is `private[aggregate]`, so this re-export in
  * the same package is the minimal way to reuse it instead of
  * reimplementing a TypedImperativeAggregate heap. Used by the
  * `topk_per_group_agg` query: per-group top-k as an ObjectHashAggregate
  * with partial (map-side) heap merge — no per-partition sort, the
  * scale-out alternative to a rank window. */
object GraftTopK {
  def collectTopK(child: Expression, num: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(child, num, reverse)
}
