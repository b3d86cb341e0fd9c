package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference workload runs against a pre-loaded MySQL catalog
  * (`use chinook`, reference SQL_file.sql:1); our analog is a loader that
  * resolves each table of the star schema from a scale-factor directory.
  * Schemas are fixed by the parquet footers (FIXTURES.md §2), so no
  * inference happens at read time — `spark.read.parquet` uses the embedded
  * schema, which both Spark and the DuckDB oracle see identically.
  *
  * Scale note: each table is a plain parquet path; at cluster scale these
  * would be directories of many files (or partitioned layouts) and the same
  * code holds — `FileSourceScanExec` parallelizes over row groups and gets
  * predicate pushdown + column pruning from Catalyst for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * sessions set spark.sql.legacy.parquet.nanosAsLong so it surfaces as
    * nanosecond longs, converted here to microsecond timestamps with
    * integral division (`div` — a double division would lose precision:
    * nanos since 1970 exceed 2^53). Floor-division matches DuckDB's
    * CAST(ns AS TIMESTAMP) truncation, so oracle timestamps agree. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (the `use chinook` analog) so
    * `spark.sql` text queries resolve the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
