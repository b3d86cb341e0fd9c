package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.{Dedup, ExtCaches}
import graft.tables.Tables

/** Focused star-vs-propagation CC cost measurement on the x30 soak
  * corpus (round 6): N reps of each form over the SAME persisted pair
  * graph, so the delta is the CC stage alone — pair generation, the
  * dominant cost in the composed queries, is charged once outside the
  * timers. */
object DiagCC {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_soak/x30"
    val reps = if (args.length > 1) args(1).toInt else 4
    val docs = Tables.documents(spark, dir)
    val pairs = ExtCaches.persistTracked(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
        .select(col("id_a"), col("id_b")))
    println(s"[cc] pair rows = ${pairs.count()}")
    for (rep <- 1 to reps) {
      val tProp = time(Dedup.connectedComponents(pairs, "id_a", "id_b").count())
      val tStar = time(Dedup.connectedComponentsStar(pairs, "id_a", "id_b").count())
      println(f"[cc] rep=$rep prop=$tProp%6.2f star=$tStar%6.2f ratio=${tStar / tProp}%4.2f")
    }
    spark.stop()
  }
}
