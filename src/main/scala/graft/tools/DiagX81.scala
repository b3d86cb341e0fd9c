package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.{Dedup, ExtCaches, Similarity}
import graft.queries.Extensions

/** x81 stage split (round-10 close, standing item for round 11): the
  * mutual-kNN clustering soaked at 39.8 s on x30 vs x20_star's 8.9 s —
  * attribute the gap between the contained kNN-graph build, the mutual
  * filter, and the star-CC fixpoint on the chain-shaped graph before
  * deciding whether a path-halving contraction is worth building.
  * Usage: sbt "runMain graft.tools.DiagX81 [dir]" */
object DiagX81 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_soak/x30")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[diagx81] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    ExtCaches.clearCaches()
    val g = time("knnGraph build+count") {
      val g0 = Similarity.knnGraph(
          graft.tables.Tables.embeddings(spark, dir), "vec_id", "embedding",
          k = Extensions.KnnGraphK, bands = Extensions.SampledBands,
          bitsPerBand = Extensions.SampledBandBits,
          dims = Extensions.EmbeddingDims, seed = Extensions.SampledSeed)
        .select(col("src_id"), col("nbr_id")).cache()
      println(s"[diagx81] edges = ${g0.count()}")
      g0
    }
    val mutual = time("mutual filter") {
      val fwd = g.filter(col("src_id") < col("nbr_id"))
        .select(col("src_id").as("id_a"), col("nbr_id").as("id_b"))
      val rev = g.filter(col("src_id") > col("nbr_id"))
        .select(col("nbr_id").as("id_a"), col("src_id").as("id_b"))
      val m = fwd.join(rev, Seq("id_a", "id_b"), "left_semi").cache()
      println(s"[diagx81] mutual edges = ${m.count()}")
      m
    }
    val labels = time("star CC fixpoint") {
      Dedup.connectedComponentsStar(mutual, "id_a", "id_b")
    }
    time("cluster summary") {
      println(s"[diagx81] clusters = ${Dedup.clusterSummary(labels).count()}")
    }
    ExtCaches.clearCaches()
    spark.stop()
  }
}
