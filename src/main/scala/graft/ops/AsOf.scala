package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right timestamp at or
  * before it per key (SURVEY §2.3 notes Spark lacks the operator; the
  * design brief names it as a candidate custom operator. Preference (a)
  * applies: it composes from built-ins with the RIGHT physical shape, so
  * no custom SparkPlan is needed).
  *
  * Physical shape — the scalable one: tag both inputs, union them, and
  * run a single `last(_, ignoreNulls)` window per key ordered by (ts,
  * side). One shuffle + one sort over |L|+|R| rows, state O(1) per row.
  * The naive composition — equi-join on key with a `r.ts <= l.ts`
  * residual, then rank — materializes every (left, earlier-right) pair
  * first: quadratic per key in time-range overlap, which is exactly what
  * kills attribution joins on long histories at 100 TB.
  *
  * Tie semantics: `strict = true` matches right rows strictly earlier
  * (left sorts before right at equal ts), `false` includes equal-ts
  * rights. Multiple right rows on the same (key, ts) carry the same
  * matched timestamp, so the output is deterministic either way.
  *
  * Null semantics (same as the native AsOfJoinExec and SQL ASOF JOIN):
  * right rows with a null key or null ts can never match, so they are
  * filtered before the union — without that filter, Window.partitionBy
  * would group null keys into one partition and null-key left rows would
  * silently receive null-key right timestamps. Left rows with a null key
  * or ts come out with a null `asofCol`: the null-key partition then
  * contains no right rows at all, and a null left ts sorts before every
  * right ts (ASC NULLS FIRST), so the running carry is still null there.
  */
object AsOf {
  /** Returns the left relation's columns plus `asofCol` = the matched
    * right timestamp (null when no earlier right row exists). */
  def lastBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 asofCol: String = "asof_ts", strict: Boolean = true): DataFrame = {
    val keyCols = keys.map(col)
    // at equal ts: strict → left first (sees only earlier rights);
    // inclusive → right first (equal-ts rights visible)
    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)
    val l = left.select(keyCols :+
      col(leftTs).as("_ts") :+
      lit(leftSide).as("_side") :+
      struct(left.columns.toIndexedSeq.map(col): _*).as("_lrow") :+
      lit(null).cast(left.schema(leftTs).dataType).as("_rts"): _*)
    val r = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .select(keyCols :+
        col(rightTs).as("_ts") :+
        lit(rightSide).as("_side") :+
        lit(null).cast(l.schema("_lrow").dataType).as("_lrow") :+
        col(rightTs).as("_rts"): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_carry", last(col("_rts"), ignoreNulls = true).over(w))
      .filter(col("_lrow").isNotNull)
      .select(col("_lrow.*"), col("_carry").as(asofCol))
  }
}
