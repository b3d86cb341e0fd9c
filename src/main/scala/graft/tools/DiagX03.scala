package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.{Dedup, ExtCaches, TextOps}
import graft.tables.Tables

/** Round-6 diagnostics for SCALING.md items: x02 df-cap sweep (join cost
  * Σ df², recall impact) and x20 star-vs-propagation CC round costs. */
object DiagX03 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val dirs = Seq(
      "x3" -> "/tmp/graft_soak/x3",
      "x10" -> "/tmp/graft_soak/x10",
      "x30" -> "/tmp/graft_soak/x30")

    // ---- x02: Σ df² (the self-join's output size) and df distribution ----
    for ((label, dir) <- dirs) {
      ExtCaches.clearCaches()
      val docs = Tables.documents(spark, dir)
      val dfs = docs.select(
          explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val stats = dfs.agg(
        count(lit(1)).as("distinct_shingles"),
        sum(col("df") * (col("df") - 1) / 2).as("join_rows"),
        max(col("df")).as("max_df"),
        sum(when(col("df") > 50, col("df") * (col("df") - 1) / 2)
          .otherwise(0L)).as("join_rows_df_gt50")).collect()(0)
      println(s"[x02] $label distinct=${stats.get(0)} join_rows=${stats.get(1)} " +
        s"max_df=${stats.get(2)} join_rows_from_df_gt50=${stats.get(3)}")
    }
    // df-cap sweep at x30: time + output pairs per cap
    val x30 = "/tmp/graft_soak/x30"
    for (cap <- Seq(None, Some(200), Some(100), Some(50)); rep <- 1 to 2) {
      ExtCaches.clearCaches()
      val docs = Tables.documents(spark, x30)
      var pairs = -1L
      val t = time {
        val idx0 = docs.select(col("doc_id").as("id"),
          TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
          .select(col("id"), size(col("sh")).cast("long").as("n"),
            explode(col("sh")).as("shingle"))
        val idx = ExtCaches.persistTracked(cap match {
          case None => idx0
          case Some(c) =>
            val cached = ExtCaches.persistTracked(idx0)
            val keep = cached.groupBy(col("shingle"))
              .agg(count(lit(1)).as("df")).filter(col("df") <= c)
              .select(col("shingle"))
            cached.join(keep, Seq("shingle"), "left_semi")
        })
        pairs = idx.as("a")
          .join(idx.as("b"),
            col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
          .groupBy(col("a.id"), col("b.id"), col("a.n"), col("b.n"))
          .agg(count(lit(1)).as("c"))
          .withColumn("j", col("c").cast("double") /
            (col("a.n") + col("b.n") - col("c")).cast("double"))
          .filter(col("j") >= 0.5).count()
      }
      println(f"[x02cap] cap=$cap%-10s rep=$rep t=$t%6.2f pairs=$pairs")
    }

    // ---- x20: star vs propagation CC cost at x30, shared pair graph ----
    for (rep <- 1 to 2) {
      ExtCaches.clearCaches()
      val docs = Tables.documents(spark, x30)
      val tPairs = time {
        val p = ExtCaches.persistTracked(
          Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
            .select(col("id_a"), col("id_b")))
        println(s"[x20] pair rows = ${p.count()}")
        ExtCaches.persistTracked(p) // keep for both CC runs below
      }
      val pairGraph = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
        .select(col("id_a"), col("id_b"))
      val tProp = time(Dedup.connectedComponents(pairGraph, "id_a", "id_b").count())
      val tStar = time(Dedup.connectedComponentsStar(pairGraph, "id_a", "id_b").count())
      println(f"[x20] rep=$rep pairs_build=$tPairs%6.2f prop_cc=$tProp%6.2f star_cc=$tStar%6.2f")
    }
    spark.stop()
  }
}
