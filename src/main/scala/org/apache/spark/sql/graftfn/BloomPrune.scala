package org.apache.spark.sql.graftfn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column wrappers over Spark's own runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter`). Catalyst injects
  * these automatically only for equi-join keys it can prove selective;
  * exposing them as columns lets an operator apply the same
  * prune-before-shuffle discipline to shapes the optimizer cannot see —
  * e.g. decontamination, where the "join" is an explode → semi-join and
  * the selective set is the eval-shingle vocabulary (graft.queries
  * .Extensions x45).
  *
  * Both sides hash through `XxHash64` (Spark's convention for these
  * expressions — the aggregate and the membership probe must agree on
  * the 64-bit key). The bloom answers "possibly present" only, so a
  * consumer keeps exactness by following the prune with an exact
  * semi-join on the survivors; the bloom's only job is to keep the
  * non-matching bulk out of that join's shuffle.
  */
object BloomPrune {
  /** Aggregate `keyCol` values into one binary bloom filter sized for
    * `expectedItems` distinct keys (~1.2 MB per million at the default
    * FPP — broadcastable long after the key set itself is not). */
  def bloomAgg(keyCol: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
          new XxHash64(Seq(ExpressionUtils.expression(keyCol))), expectedItems)
        .toAggregateExpression())

  /** Membership probe: true iff `keyCol` is POSSIBLY in the bloom
    * (false positives at the configured FPP, never false negatives).
    *
    * `bloomDf` must be a one-row, one-column plan producing the
    * [[bloomAgg]] binary — it rides in as a SCALAR SUBQUERY, the same
    * shape `InjectRuntimeFilter` emits (`might_contain` rejects a
    * join-produced column outright: its bloom operand must be constant
    * after subquery execution, so the filter can prime once per task
    * rather than deserialize the sketch per row). The subquery runs as
    * its own small job and the result is broadcast into the probe —
    * the plan-native version of the 1-row anchor discipline. */
  def mightContain(bloomDf: DataFrame, keyCol: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        ExpressionUtils.expression(bloomDf.scalar()),
        new XxHash64(Seq(ExpressionUtils.expression(keyCol)))))
}
