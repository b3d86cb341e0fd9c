package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftfn.GraftFunctions

/** One-stop session factory with the engine's recommended configuration —
  * what a deployment would put in spark-defaults.conf, collected so every
  * entry point (Verify, Bench, tests, user code) agrees:
  *
  *  - shuffle partitions sized to the executor parallelism (not the 200
  *    default, which at local scale means 200 tiny tasks per exchange and
  *    at cluster scale is a separate tuning knob);
  *  - UTC session timezone (oracle parity and sanity);
  *  - nanosecond-parquet timestamps surfaced as longs (events.ts —
  *    Spark's reader rejects TIMESTAMP(NANOS) natively; Tables.events
  *    converts to microseconds);
  *  - AQE on (default in Spark 4) — runtime coalescing + skew-join
  *    splitting;
  *  - the engine's SQL functions registered.
  */
object GraftSession {
  def build(master: String, parallelism: Int,
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(spark)
    // Live-session analog of GraftExtensions.injectOptimizerRule
    // (idempotent — build() may be called repeatedly on the same JVM).
    val rule = org.apache.spark.sql.graftfn.CountMatchesRule
    if (!spark.experimental.extraOptimizations.contains(rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    spark
  }

  /** Local session sized from an env-provided CPU count (driver contract). */
  def local(cpus: String): SparkSession =
    build(s"local[$cpus]", cpus.toInt)
}
