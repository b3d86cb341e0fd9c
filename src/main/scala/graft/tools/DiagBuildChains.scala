package graft.queries

import graft.GraftSession
import graft.ext.ExtCaches

/** Round-17: per-chain timing inside the family-5/6 build lines, to find
  * the critical path of the (now concurrent) warm builders. Each chain
  * is timed SEQUENTIALLY here, cold caches, after tiny-dir warm-up.
  * Lives in graft.queries (not .tools) to reach the private[queries]
  * anchor builders directly. */
object DiagBuildChains {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[diagchain] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val tiny = "/root/testdata/sf0.001"
    Extensions.warmAnnShared(spark, tiny)
    Extensions.warmGraphShared(spark, tiny)
    ExtCaches.clearCaches()
    (1 to 2).foreach { r =>
      time(s"ann cellStats/$r")(Extensions.sharedCellStats(spark, dir))
      time(s"ann residualPq/$r")(
        Extensions.sharedResidualPqState(spark, dir)._1.count())
      time(s"ann pqState/$r")(Extensions.sharedPqState(spark, dir)._1.count())
      ExtCaches.clearCaches()
      time(s"graph twinCellStats/$r")(Extensions.twinCellStats(spark, dir))
      time(s"graph plantedCellStats/$r")(Extensions.plantedCellStats(spark, dir))
      time(s"graph plantedSubStats/$r")(Extensions.plantedSubStats(spark, dir))
      time(s"graph twinPqState/$r")(
        Extensions.twinPqState(spark, dir)._1.count())
      ExtCaches.clearCaches()
    }
    spark.stop()
  }
}
