package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[aggregate] CollectTopK`: the bounded-heap top-k
  * aggregate Catalyst uses for its own ORDER BY … LIMIT rewrites. Exposed
  * to the function registry as `graft_topk(e, k)` — the k SMALLEST values
  * of `e` under its natural ordering (struct fields compare
  * lexicographically), returned ascending. The map-side partial keeps a
  * k-heap per group, so quota/stratified sampling never sorts the full
  * table. */
object GraftTopK {
  def smallestK(child: Expression, num: Expression): Expression =
    CollectTopK(child, CollectTopK.expressionToNum(num), reverse = true, 0, 0)
}
