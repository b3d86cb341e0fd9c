package graft.tools

import graft.{GraftSession, SparkEntry}
import graft.ext.ExtCaches

/** Round-8 attribution probe for the round-7 driver-bench tail (VERDICT r7
  * "What's wrong" #2): `x51_jaccard_prefix` printed 16.99 s and
  * `x56_cluster_purity` 3.69 s in BENCH_r07 vs their own fresh-JVM sf0.1
  * cold medians (~2.2 s / ~0.9 s). Family-level cache clears already exist
  * in Bench.scala, so the live hypothesis is late-family JVM state (heap /
  * GC / code-cache accumulation after ~65 cache-heavy queries), which no
  * recorded run isolates. This tool runs the two tail queries cold
  * (ExtCaches cleared before every rep) in two modes:
  *
  *   - default: fresh JVM, measure immediately → the isolated baseline;
  *   - SPARK_GRAFT_TAIL_PRELOAD=1: first replay the full x-family that
  *     precedes them in bench order (one rep each, caches cleared per
  *     query, exactly Bench family 3's discipline), then measure → the
  *     bench-position number.
  *
  * If preload reproduces the 8x, the driver line is attributed to JVM
  * accumulation and the mitigation lives in Bench.scala; if not, the
  * driver number was environmental (shared-VM contention) and the
  * isolated baseline is the defensible record. Results land in PLANS.md. */
object DiagTail {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val preload = sys.env.get("SPARK_GRAFT_TAIL_PRELOAD").contains("1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val targets = Seq("x51_jaccard_prefix", "x56_cluster_purity")
    if (preload) {
      // Bench family-3 order: sorted x* minus CC consumers, minus targets.
      val ccShared = Set("x20_dup_clusters", "x23_dedup_survivors",
        "x26_pipeline_gate", "x26b_corpus_build", "x36_cluster_reps",
        "x53_cluster_split", "x20_dup_clusters_star")
      val pre = SparkEntry.queries.keys.toSeq.sorted
        .filterNot(graft.Bench.Headline).filterNot(_.startsWith("s"))
        .filterNot(ccShared).filterNot(targets.contains)
      val t0 = System.nanoTime()
      pre.foreach { name =>
        ExtCaches.clearCaches()
        try SparkEntry.queries(name)(spark, dir).count()
        catch { case e: Throwable =>
          System.err.println(s"[tail] preload $name failed: ${e.getMessage}") }
      }
      println(f"[tail] preload of ${pre.size} x-queries took " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val rt = Runtime.getRuntime
    for (name <- targets; rep <- 1 to reps) {
      ExtCaches.clearCaches()
      val heapBefore = (rt.totalMemory - rt.freeMemory) / (1 << 20)
      var rows = -1L
      val t = time { rows = SparkEntry.queries(name)(spark, dir).count() }
      println(f"[tail] $name%-22s preload=$preload rep$rep ${t}%6.2f s " +
        s"rows=$rows heapBeforeMB=$heapBefore")
    }
    spark.stop()
  }
}
