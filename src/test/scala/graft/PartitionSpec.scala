package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Partitioned-layout behavior (SURVEY.md §4.2 partition pruning): the
  * driver testdata ships single parquet files, so pruning never fires
  * there — this suite writes a date-partitioned copy of `events` the way
  * a production lakehouse would lay it out and asserts that (a) partition
  * pruning eliminates directories at planning time and (b) the engine's
  * streaming/batch transforms run unchanged over the partitioned layout. */
class PartitionSpec extends SparkSpec {
  private lazy val partDir: String = {
    val dir = Files.createTempDirectory("graft_part_events").toString
    graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    dir
  }

  test("date filter prunes partitions at the scan") {
    val df = spark.read.parquet(partDir)
      .filter(col("event_date") === "2024-01-05")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters") &&
      p.contains("isnotnull(event_date") , p)
    // pruning leaves exactly the one day's files
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount }
    assert(scanned.contains(1), s"expected 1 selected partition, got $scanned")
  }

  test("windowed aggregation is identical over partitioned and flat layouts") {
    val flat = graft.streaming.EventStreams.tumblingStats(
      graft.tables.Tables.events(spark, "/root/testdata/sf0.001"), "6 hours")
    val part = graft.streaming.EventStreams.tumblingStats(
      spark.read.parquet(partDir).drop("event_date"), "6 hours")
    assert(part.exceptAll(flat).isEmpty && flat.exceptAll(part).isEmpty)
  }
}
