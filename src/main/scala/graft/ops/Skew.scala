package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / the 100 TB design brief).
  *
  * AQE's skew-join splitting handles skewed JOINS at runtime; skewed
  * AGGREGATIONS (one hot group key receiving a large fraction of rows —
  * e.g. the "en" language bucket of a web corpus, or a null-heavy key)
  * still hash every row of the hot key to one reducer. The standard fix
  * is two-phase salted aggregation:
  *
  *   phase 1: group by (key, salt = hash(row) % buckets) — the hot key's
  *            rows spread over `buckets` reducers, each producing a
  *            partial aggregate;
  *   phase 2: group by key over the ≤ buckets partials.
  *
  * Works for any algebraic aggregate (sum/count/min/max — anything with
  * an associative merge). The salt uses a deterministic hash of salt
  * columns when result-stability matters, or spark_partition_id for pure
  * load spreading.
  */
object Skew {
  /** Salted two-phase sum/count aggregation: semantically identical to
    * `df.groupBy(keys).agg(sum(valueCol), count(*))` but the heavy shuffle
    * is keyed on (key, salt), never concentrating a hot key.
    *
    * @param saltFrom columns whose hash spreads the hot key (must not be
    *                 the group keys themselves); e.g. a high-cardinality id
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
                     saltFrom: Seq[String], buckets: Int = 32,
                     sumName: String = "sum_value", cntName: String = "n_rows")
  : DataFrame = {
    val salt = pmod(hash(saltFrom.map(col): _*), lit(buckets)).as("_salt")
    val keyCols = keys.map(col)
    df.groupBy(keyCols :+ salt: _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_psum")).as(sumName), sum(col("_pcnt")).as(cntName))
  }
}
