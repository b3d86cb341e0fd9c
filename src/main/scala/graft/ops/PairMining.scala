package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair mining (reference SQL_file.sql:392–454).
  *
  * The reference self-joins invoice_line on the basket key with
  * `i1.invoice_line_id < i2.invoice_line_id` so each unordered *line* pair
  * is visited once, then labels both sides and keeps `label1 < label2`
  * (SQL_file.sql:399,:408). Note the second predicate applied to the
  * already-ordered line pair silently drops pairs whose first-by-line-id
  * item has the lexicographically larger label — we implement the intended
  * semantics (SURVEY.md §7.5 #3): canonicalize with least/greatest so every
  * cross-label line pair counts exactly once.
  *
  * Physical shape, chosen for 100 TB: NOT a self-join. A self-join on the
  * basket key reads + shuffles the (already joined) line relation twice and
  * recomputes its upstream plan for both sides. Instead we group once by
  * basket (`collect_list` of (line_id,label) structs — baskets are small,
  * ~4 lines, so a basket's array is bytes, not MBs), then expand the
  * C(n,2) pairs *inside* the row with codegen'd higher-order functions
  * (`transform`+`slice`+`flatten`). One wide shuffle of the narrow
  * (basket, line, label) projection, one tiny shuffle of pair counts.
  * Skewed mega-baskets would make one array large; C(n,2) blow-up is the
  * same in both shapes, but if a basket could be huge the self-join + AQE
  * skew split would be preferable — our basket key is an order (bounded
  * fan-out by construction), so in-row expansion wins.
  */
object PairMining {
  /** Unordered co-occurrence counts of `labelCol` values within a basket.
    *
    * `lines` must contain `basketCol`, `lineIdCol` (unique within basket)
    * and `labelCol`. Output: label_a < label_b, pair_count. Semantics are
    * identical to the reference's `a.ln < b.ln` self-join: after sorting
    * the basket's array by line id, position order == line-id order, and
    * `slice(..., i+2, ...)` visits exactly the j > i positions. */
  def coOccurrence(lines: DataFrame, basketCol: String, lineIdCol: String,
                   labelCol: String): DataFrame = {
    val baskets = lines
      .select(col(basketCol).as("bk"), col(lineIdCol).as("ln"), col(labelCol).as("lab"))
      .groupBy(col("bk"))
      .agg(sort_array(collect_list(struct(col("ln"), col("lab")))).as("items"))
    baskets
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)),
          |            y -> struct(least(x.lab, y.lab) AS label_a,
          |                        greatest(x.lab, y.lab) AS label_b))))""".stripMargin))
        .as("p"))
      .filter(col("p.label_a") =!= col("p.label_b"))
      .groupBy(col("p.label_a").as("label_a"), col("p.label_b").as("label_b"))
      .agg(count(lit(1)).as("pair_count"))
  }

  /** C(n,2) KEY-pair expansion straight from the line relation: group by
    * basket, collect the (integer) item keys, expand unordered position
    * pairs in-row. The narrowest possible cached form of the basket pair
    * graph — two longs per pair — from which any label's affinity is two
    * dimension equi-joins + an aggregate (see Chinook.affinity). Compared
    * to expanding label strings in-row, the HOF moves 16 bytes instead
    * of ~120 per pair and the persisted relation is an integer edge
    * list. Key pairs are kept in position
    * order (not canonicalized): keys are unique per line, not per value,
    * so canonical ordering is the LABEL aggregation's job. */
  def coOccurrenceKeyPairs(lines: DataFrame, basketCol: String,
                           keyCol: String): DataFrame =
    lines
      .select(col(basketCol).as("bk"), col(keyCol).as("k"))
      .groupBy(col("bk"))
      .agg(collect_list(col("k")).as("ks"))
      .select(explode(expr(
        """flatten(transform(ks, (x, i) ->
          |  transform(slice(ks, i + 2, size(ks)),
          |            y -> struct(x AS k_a, y AS k_b))))""".stripMargin))
        .as("p"))
      .select(col("p.k_a"), col("p.k_b"))

  /** Canonical-pair ordering for presentation. */
  def ordered(pairs: DataFrame): DataFrame =
    pairs.orderBy(desc("pair_count"), col("label_a"), col("label_b"))
}
