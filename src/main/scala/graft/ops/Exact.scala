package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Exact (order-independent) aggregation helpers.
  *
  * Why: the driver's correctness gate hash-compares our parquet output
  * against DuckDB running the same SQL (SURVEY.md §5.2). Double summation
  * is order-dependent, and Spark's partial/final aggregation visits rows in
  * a different order than DuckDB — the last ulp of a plain `sum(double)`
  * would differ nondeterministically. The fix used across every money/qty
  * aggregate in this engine:
  *
  *   1. each input double is cast per-row to a fixed-scale decimal
  *      (both engines round the *same* IEEE double to the same decimal);
  *   2. the SUM runs in exact decimal arithmetic (associative, so shuffle
  *      order and partial-aggregation splits cannot change the result);
  *   3. the final value is cast back to double (same nearest-double in
  *      both engines).
  *
  * This is also the right call at 100 TB: decimal partial aggregation keeps
  * map-side combine exact across thousands of partial aggregates, where a
  * double sum would drift with partition count.
  */
object Exact {
  /** Per-row money cast: double → DECIMAL(18,2). */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Per-row 4-decimal cast for computed per-row revenue expressions. */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact decimal sum kept as decimal (for further exact re-aggregation). */
  def sumMoney(c: Column): Column = sum(money(c))

  /** Exact decimal sum surfaced as double (final output form). */
  def sumMoneyD(c: Column): Column = sumMoney(c).cast(DoubleType)

  /** lineitem revenue convention, fixed engine-wide (SURVEY.md §7.2):
    * l_extendedprice * (1 - l_discount), exact at 4 decimals. The per-row
    * double product is IEEE-deterministic, so the decimal cast agrees
    * bit-for-bit with the DuckDB oracle's `CAST(... AS DECIMAL(18,4))`. */
  def lineRevenue: Column =
    dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  def sumRevenue: Column = sum(lineRevenue)
  def sumRevenueD: Column = sumRevenue.cast(DoubleType)

  /** Deterministic ratio: both operands cast to double, one IEEE divide. */
  def ratio(n: Column, d: Column): Column =
    n.cast(DoubleType) / d.cast(DoubleType)

  /** Exact average of integral values: sum(long)/count as one double
    * division (Spark's avg() on integrals may accumulate in double). */
  def avgLong(c: Column): Column =
    ratio(sum(c.cast(LongType)), count(c))
}
