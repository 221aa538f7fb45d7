package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column API over Catalyst's OWN Bloom-filter pair — the aggregate
  * that builds a filter over long keys and the `might_contain` probe —
  * the same expressions the runtime-filter rule injects around shuffle
  * joins (pinned in RuntimeFilterSpec), here used EXPLICITLY for
  * application-level membership pruning where the planner can't see
  * the opportunity (e.g. a decontamination gram set maintained across
  * jobs). Both are private[sql]; this package-located facade exposes
  * them unchanged rather than reimplementing a worse copy.
  */
object BloomKernels {
  /** Aggregate: a serialized Bloom filter over a LONG key column,
    * sized for `items` expected keys in `bits` bits. */
  def bloomAgg(key: Column, items: Long, bits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(key), Literal(items), Literal(bits))
      .toAggregateExpression())

  /** Membership probe: false => definitely absent (no false
    * negatives); true => present or a false positive at the filter's
    * configured rate. */
  def mightContain(bloom: Column, key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(key)))
}
