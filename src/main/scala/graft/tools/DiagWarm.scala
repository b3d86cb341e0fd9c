package graft.tools

import graft.GraftSession

/** Round-6 A/B for the shared_cache_build regression (round-5 verdict
  * item 2): times Chinook.warmCaches concurrent vs sequential on sf0.1,
  * several reps each, caches cleared between reps. The driver's r5 run
  * charged 7.79 s; the r4 run (sequential build) charged 2.77 s. */
object DiagWarm {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // JVM/codegen warm-up against the tiny dir, exactly like Bench.
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try {
      graft.queries.Chinook.warmCaches(spark, "/root/testdata/sf0.001")
      graft.queries.Chinook.clearCaches(spark)
    } catch { case _: Throwable => () }
    for (mode <- Seq("concurrent", "sequential", "concurrent", "sequential");
         rep <- 1 to 3) {
      graft.queries.Chinook.clearCaches(spark)
      val t = time(graft.queries.Chinook.warmCaches(spark, dir,
        concurrent = mode == "concurrent"))
      println(f"[warm] $mode%-11s rep=$rep t=$t%6.2f")
    }
    spark.stop()
  }
}
