package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range join — match points to (possibly overlapping, irregular)
  * intervals (the design brief's second named missing operator, next to
  * as-of). A plain `p >= lo AND p < hi` join has no equi-key, so Spark
  * plans BroadcastNestedLoopJoin: every (point, interval) pair is tested —
  * quadratic, and the standard scale killer for point-in-interval
  * workloads.
  *
  * Scalable shape (preference (a): composition): discretize the domain
  * into fixed-width bins. Each interval EXPLODES to the bins it covers;
  * each point maps to exactly one bin; the join becomes an equi-join on
  * the bin id followed by the exact residual predicate. A point matches
  * an interval in precisely one bin (its own), so no dedup pass is
  * needed. Cost: |intervals| × avg-covered-bins + |points|, shuffled on
  * a key both sides share — hash join, pruning, AQE all apply. Bin width
  * trades index size against residual selectivity, exactly like an IVF
  * nlist.
  */
object RangeJoin {
  /** Inner-join points to intervals with `lo <= point < hi`.
    *
    * @param binWidth domain discretization width; choose ≈ median interval
    *                 length so most intervals cover O(1) bins
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0)
    val binned = intervals.withColumn("_bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast(LongType),
        // an interval ending exactly on a bin edge emits one extra empty
        // candidate bin; the residual predicate removes any false match
        floor(col(hiCol) / binWidth).cast(LongType))))
    points.withColumn("_bin", floor(col(pointCol) / binWidth).cast(LongType))
      .join(binned, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }
}
