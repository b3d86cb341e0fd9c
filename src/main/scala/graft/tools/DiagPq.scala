package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.{ExtCaches, Similarity}
import graft.queries.Extensions
import graft.tables.Tables

/** PQ code-rate pricing (round-10 verdict #4: "price PQ at the
  * production FAISS code rate"): recall@3, exact-top-3 ⊆ ADC-top-10/50
  * coverage, and the IVF×PQ (x76) recall, for codewords-per-subspace ∈
  * {16, 64, 256} at a given scale dir. Ground truth is the exact
  * fixed-point cosine top-3 ([[Similarity.bruteForceTopK]] — the same
  * truth the x71/x74/x75 tables use). One line per configuration. */
object DiagPq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < Extensions.QuerySetSize)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 3)
      .select(col("q_id"), col("c_id")).cache()
    val nExact = exact.count()
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("q_id"), col("c_id")).join(exact, Seq("q_id", "c_id")).count()
    for (codes <- Seq(16, 64, 256)) {
      val top50 = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 50,
        m = Extensions.PqM, codes = codes,
        lloydRounds = Extensions.PqLloydRounds,
        dims = Extensions.EmbeddingDims).cache()
      val r3 = hits(top50.filter(col("rnk") <= 3))
      val c10 = hits(top50.filter(col("rnk") <= 10))
      val c50 = hits(top50)
      val ivf = hits(Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
        k = 3, cells = Extensions.ScaledCells,
        cellLloydRounds = Extensions.ScaledLloydRounds,
        nprobe = Extensions.ScaledNprobe, m = Extensions.PqM,
        codes = codes, pqLloydRounds = Extensions.PqLloydRounds,
        dims = Extensions.EmbeddingDims))
      val bits = (math.log(codes) / math.log(2)).round
      println(f"codes=$codes%3d (${bits}-bit, ${Extensions.PqM * bits / 8.0}%.0f B/vec): " +
        f"recall@3 $r3/$nExact  top3⊆ADCtop10 $c10/$nExact  ⊆top50 $c50/$nExact  " +
        f"x76(ivf,nprobe=${Extensions.ScaledNprobe}) recall@3 $ivf/$nExact")
      top50.unpersist()
      ExtCaches.clearCaches()
    }
    spark.stop()
  }
}
