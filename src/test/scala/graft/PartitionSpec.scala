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

  test("selective dim filter dynamically prunes the partitioned fact scan (DPP)") {
    // The 100 TB star-join mechanism the static test above cannot show:
    // the filter lives on the DIMENSION side, so the fact's partition
    // list is unknowable at planning time — Spark's dynamic partition
    // pruning plants a runtime subquery (the broadcast dim's keys) into
    // the fact scan's PartitionFilters, and only the matching date
    // directories are ever read. Without DPP every date partition of a
    // 100 TB fact would be scanned to serve a one-week dim filter.
    // DPP requires a selective PREDICATE on the dim side (a limit does
    // not qualify as one) — filter to the first two days of any month.
    val dim = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
      .select(to_date(col("ts")).as("event_date")).distinct()
      .filter(dayofmonth(col("event_date")) <= 2)
    val expectedDates = dim.count()
    val fact = spark.read.parquet(partDir)
    val joined = fact.join(dim, Seq("event_date"))
    // collect() executes THIS QueryExecution (count() would build and
    // run a separate aggregated plan, leaving these metrics at zero)
    val n = joined.collect().length
    val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("dynamicpruning"), p)
    // the pruned scan must read exactly the dim's date directories —
    // walk through AQE wrappers (query-stage inner plans are not
    // `children`, so a plain collect misses them)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(pl: SparkPlan): Seq[FileSourceScanExec] = {
      val here = pl match { case s: FileSourceScanExec => Seq(s); case _ => Nil }
      val kids = pl match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(scans)
    }
    val scanned = scans(joined.queryExecution.executedPlan)
      .find(_.output.exists(_.name == "event_id"))
      .flatMap(_.metrics.get("numPartitions").map(_.value))
    assert(scanned.contains(expectedDates),
      s"expected $expectedDates scanned partitions, got $scanned")
    assert(expectedDates > 0 && n > 0)
  }

  test("windowed aggregation is identical over partitioned and flat layouts") {
    val flat = graft.streaming.EventStreams.tumblingStats(
      graft.tables.Tables.events(spark, "/root/testdata/sf0.001"), "6 hours")
    val part = graft.streaming.EventStreams.tumblingStats(
      spark.read.parquet(partDir).drop("event_date"), "6 hours")
    assert(part.exceptAll(flat).isEmpty && flat.exceptAll(part).isEmpty)
  }
}
