package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.PairMining
import graft.tables.Tables

/** Round-17 profile of the basket-pair build (the r16 verdict's #8:
  * "make the C(n,2) expansion a codegen expression IF profiling shows
  * the HOF dominates"). Times, at the bench SF with the noop sink:
  *   (a) grouped baskets only (shuffle + collect_list, no expansion);
  *   (b) the full key-pair expansion (adds the HOF explode);
  *   (c) the view aggregate (the other half of shared_cache_build).
  */
object DiagPairHof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[diagpair] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // JVM warm-up
    val tiny = "/root/testdata/sf0.001"
    noop(PairMining.coOccurrenceKeyPairs(Tables.lineitem(spark, tiny),
      "l_orderkey", "l_partkey"))
    val li = Tables.lineitem(spark, dir)
    val baskets = li
      .select(col("l_orderkey").as("bk"), col("l_partkey").as("k"))
      .groupBy(col("bk")).agg(collect_list(col("k")).as("ks"))
    (1 to 3).foreach { r =>
      time(s"baskets only (no expansion)/$r")(noop(baskets))
      time(s"full key-pair expansion/$r")(noop(
        PairMining.coOccurrenceKeyPairs(li, "l_orderkey", "l_partkey")))
    }
    spark.stop()
  }
}
