package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-aggregation variants for 100 TB interactive use
  * (SURVEY.md §2.4 A4 note). Exact `countDistinct` plans an Expand +
  * two-phase aggregate — per distinct column it reshuffles the whole
  * input; `percentile` buffers each group's values. At petabyte scale the
  * sketch versions are the default and exactness is the opt-in, not the
  * reverse:
  *
  *  - HyperLogLog++ (`approx_count_distinct`): fixed-size sketch per
  *    group, single pass, mergeable partials — shuffle carries KBs, not
  *    the distinct set. Deterministic for fixed input (hash-based), but
  *    sketch layouts differ across engines, so no DuckDB oracle.
  *  - KLL-style quantiles (`approx_percentile`): bounded-memory rank
  *    sketch with an accuracy knob.
  *
  * Exact twins live in the main queries (q10/s05 countDistinct,
  * s14 percentile); these wrappers standardize the engine's accuracy
  * knobs in one place.
  */
object Approx {
  /** HLL++ distinct count; rsd = relative standard deviation (0.05 ≈ 5%). */
  def distinctCount(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Rank-sketch percentile; accuracy = 1/eps (10000 → ~0.01% rank error). */
  def percentileApprox(c: Column, p: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(p), lit(accuracy))

  /** Per-group distinct-count comparison frame: exact vs sketch — handy
    * for picking rsd on a data sample before a full run. */
  def distinctCountAudit(df: DataFrame, groupCols: Seq[String], target: String,
                         rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(target)).as("exact_distinct"),
        distinctCount(col(target), rsd).as("approx_distinct"))
      .withColumn("rel_err",
        abs(col("approx_distinct") - col("exact_distinct"))
          / col("exact_distinct"))
}
