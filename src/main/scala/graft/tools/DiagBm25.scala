package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** The x87 knob experiment the round-11 verdict's stretch #8 named: on
  * the registry corpus tf-saturation and length-normalization are MOOT
  * (distinct-shingle sets have tf = 1, the generator emits uniform
  * lengths), so x87 ships idf-only and documents the other two BM25
  * terms as absent knobs. This diagnostic builds the corpus where they
  * stop being moot — a deterministic TOKEN-STUFFED variant (25 % of
  * docs get the corpus's 20 most-frequent tokens appended ×8 each:
  * repeated tokens AND 4× length variance) with planted relevance
  * twins ([[graft.ext.Relevance.twinDocs]]) — and measures three
  * token-level lexical arms on planted hit@k:
  *
  *   count : shared-distinct-token count (x79's lexical form at token
  *           granularity) — no defense against stuffing;
  *   idf   : Σ idf(t) over shared tokens (x87's damping) — rare tokens
  *           outrank stuffed common ones, but a stuffed doc still
  *           accumulates mass from every shared token;
  *   bm25  : full Robertson/Spärck-Jones BM25 (k1 = 1.2, b = 0.75) —
  *           tf-saturation caps the stuffed repeats, length-norm
  *           penalizes the stuffed doc's inflated length.
  *
  * Diag-level (doubles; libm-free hash-gating is x87's job — this tool
  * prices the knobs, Bm25KnobSpec pins the direction at sf0.01).
  * Usage: runMain graft.tools.DiagBm25 <sfDir>
  */
object DiagBm25 {
  val StuffTopK = 20
  val StuffReps = 8
  val StuffModulo = 4 // 1-in-4 docs stuffed
  val K1 = 1.2
  val B = 0.75

  /** The deterministic stuffed corpus: (doc_id, text) with 1/StuffModulo
    * of docs (by portable hash) carrying the global top-StuffTopK tokens
    * appended StuffReps times each. */
  def stuffedDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val toks = docs.select(col("doc_id"),
      explode(graft.ext.TextOps.tokens(col("text"))).as("token"))
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token")).limit(StuffTopK)
      .agg(concat_ws(" ",
        flatten(collect_list(array((1 to StuffReps).map(_ => col("token")): _*))))
        .as("stuffing"))
    val u16 = (s: org.apache.spark.sql.Column) =>
      conv(substring(md5(s), 1, 4), 16, 10).cast(LongType)
    docs.crossJoin(broadcast(top))
      .select(col("doc_id"),
        when(u16(concat(lit("stuff|"), col("doc_id").cast(StringType)))
            % StuffModulo === 0L,
          concat_ws(" ", col("text"), col("stuffing")))
          .otherwise(col("text")).as("text"))
  }

  /** Planted hit@k of the three lexical arms over a corpus, at SHINGLE
    * granularity (the engine's lexical unit — token-level overlap does
    * not discriminate documents on this small-vocabulary corpus; w=3
    * shingles do) but WITH multiplicity, so tf-saturation has something
    * to saturate. Returns (arm, n_queries, hits_at_1, hits_at_k) rows. */
  def lexArmsHits(corpus: DataFrame, nQueries: Int, armK: Int,
                  k: Int): DataFrame = {
    import graft.ext.Relevance
    val udocs = corpus.unionByName(
      Relevance.twinDocs(corpus, "doc_id", "text", nQueries))
    // shingle-occurrence tf index: (id, shingle, tf) + per-doc length
    val occ = udocs.select(col("doc_id").as("id"),
      explode(org.apache.spark.sql.graftfn.ShingleArray.shingleOccurrences(
        graft.ext.TextOps.tokens(col("text")), 3)).as("token"))
    val tf = occ.groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf")).persist()
    val dlen = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl")).persist()
    val n = udocs.agg(count(lit(1)).as("n_docs"))
    val avgdl = dlen.agg((sum(col("dl")).cast(DoubleType) /
      count(lit(1)).cast(DoubleType)).as("avgdl"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val qTf = tf.filter(col("id") < nQueries)
      .select(col("id").as("q_id"), col("token"))
    val hits = qTf.join(tf, Seq("token")).filter(col("id") =!= col("q_id"))
      .join(df, Seq("token"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(avgdl))
      .join(dlen, Seq("id"))
    // idf: the Robertson form ln((N - df + 0.5)/(df + 0.5) + 1)
    val idf = log((col("n_docs").cast(DoubleType) - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    val satTf = (col("tf").cast(DoubleType) * (K1 + 1.0)) /
      (col("tf").cast(DoubleType) + lit(K1) * (lit(1.0 - B) +
        lit(B) * col("dl").cast(DoubleType) / col("avgdl")))
    val scored = hits.groupBy(col("q_id"), col("id"))
      .agg(count(lit(1)).cast(DoubleType).as("s_count"),
        sum(idf).as("s_idf"),
        sum(idf * satTf).as("s_bm25"))
    def armHits(arm: String, scoreCol: String): DataFrame = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(desc(scoreCol), col("id"))
      val ranked = scored
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .filter(col("rnk") <= armK)
      val isTwin = col("id") === col("q_id") + Relevance.TwinIdOffset
      ranked.agg(
        count(when(isTwin && col("rnk") === 1L, lit(1))).as("hits_at_1"),
        count(when(isTwin && col("rnk") <= k, lit(1))).as("hits_at_k"))
        .crossJoin(broadcast(
          corpus.filter(col("doc_id") < nQueries)
            .agg(count(lit(1)).as("n_queries"))))
        .select(lit(arm).as("arm"), col("n_queries"),
          col("hits_at_1"), col("hits_at_k"))
    }
    armHits("1_count", "s_count")
      .unionByName(armHits("2_idf", "s_idf"))
      .unionByName(armHits("3_bm25", "s_bm25"))
      .orderBy(col("arm"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Extensions.{HybridArmK, HybridTopK, RelevanceQueries}
    println(s"== plain corpus (tf=1, uniform lengths — the knobs are moot) ==")
    lexArmsHits(graft.tables.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")),
      RelevanceQueries, HybridArmK, HybridTopK).show(false)
    println(s"== stuffed corpus (repeated tokens, 4x length variance) ==")
    lexArmsHits(stuffedDocs(spark, dir),
      RelevanceQueries, HybridArmK, HybridTopK).show(false)
    spark.stop()
  }
}
