package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.tables.Tables

/** Dev diagnostic for the x98 relevance harness: dump the twin text /
  * fused rows for one query id to chase an engine-vs-oracle divergence.
  * Usage: runMain graft.tools.DiagX98 <sfDir> <qId> */
object DiagX98 {
  def main(args: Array[String]): Unit = {
    val (dir, qid) = (args(0), args(1).toLong)
    val spark = graft.GraftSession.local("4")
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{Relevance, Retrieval}
    import graft.queries.Extensions._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val embs = Tables.embeddings(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("embedding"))
    val udocs = docs.unionByName(
      Relevance.twinDocs(docs, "doc_id", "text", RelevanceQueries))
    val uembs = embs.unionByName(
      Relevance.twinEmbs(embs, "vec_id", "embedding", RelevanceQueries))
    val queries = docs.filter(col("doc_id") < RelevanceQueries)
      .join(uembs.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
    println("== twin text ==")
    udocs.filter(col("doc_id") === qid + Relevance.TwinIdOffset).show(false)
    println("== source text ==")
    udocs.filter(col("doc_id") === qid).show(false)
    val fused = Retrieval.hybridRrfTopK(udocs, uembs, queries, "doc_id",
      "text", "vec_id", "embedding", armK = HybridArmK, k = HybridTopK,
      rrfC = RrfC, idfWeighted = false, denseArm = Retrieval.bruteArm)
    println("== fused (brute) for qid ==")
    fused.filter(col("q_id") === qid).orderBy(col("rnk")).show(false)
    spark.stop()
  }
}

/** Per-arm cost attribution of the x98 harness at a given SF dir:
  * time each arm's hit row separately (same plans the registry query
  * unions). Usage: runMain graft.tools.DiagX98Cost <sfDir> */
object DiagX98Cost {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{Relevance, Retrieval, Similarity}
    import graft.queries.Extensions._
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[x98cost] $label: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    // the registry form first (shared cell training between the arms)
    for (rep <- 1 to 3) {
      val s0 = System.nanoTime()
      graft.queries.Extensions.x98_retrieval_relevance(spark, dir).collect()
      println(f"[x98cost] registry_form rep$rep: ${(System.nanoTime() - s0) / 1e9}%.2f s")
      graft.ext.ExtCaches.clearCaches()
    }
    for (rep <- 1 to 2) {
      println(s"== rep $rep ==")
      val docs = Tables0.docs(spark, dir)
      val embs = Tables0.embs(spark, dir)
      val udocs = docs.unionByName(
        Relevance.twinDocs(docs, "doc_id", "text", RelevanceQueries))
      val uembs = embs.unionByName(
        Relevance.twinEmbs(embs, "vec_id", "embedding", RelevanceQueries))
      val queries = docs.filter(col("doc_id") < RelevanceQueries)
        .join(uembs.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
      def run(arm: String, idf: Boolean, dense: Retrieval.DenseArm): Unit =
        t(arm)(Relevance.hitsAtK(arm,
          Retrieval.hybridRrfTopK(udocs, uembs, queries, "doc_id", "text",
            "vec_id", "embedding", armK = HybridArmK, k = 2 * HybridArmK,
            rrfC = RrfC, idfWeighted = idf, denseArm = dense),
          queries, HybridTopK).collect())
      val sq8Arm: Retrieval.DenseArm = (corpus, qv, armK) =>
        Similarity.ivfSq8TopKScaled(corpus, qv, "id", "vec", k = armK,
            cells = ScaledCells, lloydRounds = ScaledLloydRounds,
            nprobe = ScaledNprobe)
          .select(col("q_id"), col("c_id").as("id"), col("rnk").as("vec_rnk"))
      val pqArm: Retrieval.DenseArm = (corpus, qv, armK) =>
        Similarity.ivfPqTopK(corpus, qv, "id", "vec", k = armK,
            cells = ScaledCells, cellLloydRounds = ScaledLloydRounds,
            nprobe = ScaledNprobe, m = PqM, codes = PqCodes,
            pqLloydRounds = PqLloydRounds, dims = EmbeddingDims)
          .select(col("q_id"), col("c_id").as("id"), col("rnk").as("vec_rnk"))
      run("1_brute", idf = false, Retrieval.bruteArm)
      run("2_ivf_sq8", idf = false, sq8Arm)
      run("3_ivf_pq", idf = false, pqArm)
      run("4_bm25_brute", idf = true, Retrieval.bruteArm)
      graft.ext.ExtCaches.clearCaches()
    }
    spark.stop()
  }

  private object Tables0 {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    import org.apache.spark.sql.types.DoubleType
    def docs(s: SparkSession, dir: String): DataFrame =
      graft.tables.Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def embs(s: SparkSession, dir: String): DataFrame =
      graft.tables.Tables.embeddings(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("embedding"))
  }
}
