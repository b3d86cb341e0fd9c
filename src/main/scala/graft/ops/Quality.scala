package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-quality utilities (reference SQL_file.sql:4–22 and the docx Q1
  * cleaning policy: numeric→0, categorical→"Unknown").
  */
object Quality {
  /** PK-duplicate probe: `GROUP BY pk HAVING COUNT(*) > 1`
    * (SQL_file.sql:4–9). */
  def duplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Null audit: one row per audited column with its null count — a
    * generalized form of the reference's 9-column IS NULL disjunction
    * (SQL_file.sql:12–22). Single pass: one conditional count per column. */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Count of rows with *any* audited column null (the reference's exact
    * `WHERE a IS NULL OR b IS NULL OR ...` shape). */
  def anyNullCount(df: DataFrame, cols: Seq[String]): DataFrame = {
    val anyNull: Column = cols.map(col(_).isNull).reduce(_ || _)
    df.filter(anyNull).agg(count(lit(1)).cast(LongType).as("null_rows"))
  }

  /** docx Q1 cleaning rule as an engine utility. */
  def cleanse(df: DataFrame, numeric: Seq[String], categorical: Seq[String],
              label: String = "Unknown"): DataFrame =
    df.na.fill(0, numeric).na.fill(label, categorical)
}
