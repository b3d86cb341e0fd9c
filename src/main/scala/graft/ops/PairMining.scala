package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale: the self-join is an equi-join on the basket key (hash join, no
  * cartesian) with the `<` residual as a post-join filter. Baskets are
  * small (~4 lines), so the blow-up per basket is C(n,2) — bounded. At
  * 100 TB the join shuffles both sides by basket key once; AQE handles
  * skewed mega-baskets via skew-join splitting.
  */
object PairMining {
  /** Unordered co-occurrence counts of `labelCol` values within a basket.
    *
    * `lines` must contain `basketCol`, `lineIdCol` (unique within basket)
    * and `labelCol`. Output: label_a < label_b, pair_count (desc). */
  def coOccurrence(lines: DataFrame, basketCol: String, lineIdCol: String,
                   labelCol: String): DataFrame = {
    val a = lines.select(
      col(basketCol).as("bk"), col(lineIdCol).as("ln"), col(labelCol).as("lab"))
    val b = a.select(col("bk").as("bk2"), col("ln").as("ln2"), col("lab").as("lab2"))
    a.join(b, col("bk") === col("bk2") && col("ln") < col("ln2"))
      .filter(col("lab") =!= col("lab2"))
      .select(
        least(col("lab"), col("lab2")).as("label_a"),
        greatest(col("lab"), col("lab2")).as("label_b"))
      .groupBy("label_a", "label_b")
      .agg(count(lit(1)).as("pair_count"))
  }

  /** Canonical-pair ordering for presentation. */
  def ordered(pairs: DataFrame): DataFrame =
    pairs.orderBy(desc("pair_count"), col("label_a"), col("label_b"))
}
