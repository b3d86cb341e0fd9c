package graft.tools

import graft.GraftSession
import graft.ext.ExtCaches

/** Round-17 A/B for the family-5/6 anchor build lines: time
  * warmAnnShared / warmGraphShared exactly as the bench's timedBuild
  * lines do (cold ExtCaches, one shot), after the standard tiny-dir
  * JVM warm-up. */
object DiagWarmBuilds {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[diagwarm] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val tiny = "/root/testdata/sf0.001"
    graft.queries.Extensions.warmAnnShared(spark, tiny)
    graft.queries.Extensions.warmGraphShared(spark, tiny)
    ExtCaches.clearCaches()
    (1 to 2).foreach { rep =>
      time(s"ann_trained_build/$rep")(
        graft.queries.Extensions.warmAnnShared(spark, dir))
      ExtCaches.clearCaches()
      time(s"graph_trained_build/$rep")(
        graft.queries.Extensions.warmGraphShared(spark, dir))
      ExtCaches.clearCaches()
    }
    spark.stop()
  }
}
