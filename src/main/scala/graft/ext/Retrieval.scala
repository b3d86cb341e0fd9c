package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Hybrid (lexical + vector) retrieval with reciprocal-rank fusion — the
  * standard production shape for RAG-style corpus search: a sparse arm
  * (shingle-overlap ranking off an inverted index; the BM25 slot) and a
  * dense arm (embedding cosine top-k; the ANN slot) each retrieve a
  * shortlist, and the lists are fused by RRF (Cormack/Clarke/Buettcher,
  * SIGIR'09): score(d) = Σ_arms 1/(C + rank_arm(d)), missing-from-arm
  * contributing 0. RRF needs no score calibration between arms — only
  * ranks — which is exactly why it is the default fusion in hybrid
  * search engines.
  *
  * Determinism (the reason RRF, not weighted-score fusion, is the
  * oracle-gated form): each arm's rank is an integer with a total
  * deterministic order (count/cosine desc, id tiebreak); 1/(C+rank) is
  * ONE correctly-rounded IEEE divide on exactly-representable operands,
  * and the fused score is ONE two-term sum — bit-identical in any engine
  * that evaluates the same two terms, with no order-of-accumulation
  * hazard (two-term IEEE addition is symmetric).
  *
  * Scale shape: the lexical arm is an inverted-index equi-join — query
  * shingles (|queries|·shingles/doc rows, broadcast) probe the corpus
  * index, so cost ∝ posting-list mass of the query terms, with the
  * df-cap knob dropping stop-shingles exactly as in
  * [[Dedup.shingleIndex]]. The dense arm broadcasts the query vectors
  * and scans the corpus once (the x06 baseline; a deployment swaps in
  * any of the IVF variants — the fusion is rank-only, so the arm is
  * pluggable). The fusion itself is a full-outer equi-join of two
  * ≤ |queries|·armK row shortlists — negligible at any scale.
  */
object Retrieval {

  /** Top-`k` fused results per query.
    *
    * @param docs    corpus documents (idCol, textCol, …)
    * @param embs    corpus embeddings (vecIdCol, vecCol); the ranked
    *                universe is docs ∩ embs (both arms must rank the
    *                same corpus or ranks are incomparable)
    * @param queries query doc ids (any DataFrame bearing `docIdCol`);
    *                must be broadcast-small
    * @param armK    shortlist depth of EACH arm before fusion
    * @param rrfC    the RRF smoothing constant (60 in the paper)
    * @param dfCap   optional stop-shingle document-frequency cap for the
    *                lexical index (the 100 TB knob)
    * Output: (q_id, doc_id, lex_rnk, vec_rnk, rrf, rnk) — arm ranks are
    * null when the doc was retrieved by the other arm only.
    */
  /** Dense-arm contract: (corpusVecs(id, vec), queryVecs(id, vec), armK)
    * → (q_id, id, vec_rnk ≤ armK). The fusion consumes only ranks, so
    * any ANN variant satisfies it; an arm may return FEWER than armK
    * rows per query (an IVF arm ranks only probed-cell members) — the
    * full-outer fusion treats absence as a zero term, which is RRF's
    * defined semantics for missing-from-arm. */
  type DenseArm = (DataFrame, DataFrame, Int) => DataFrame

  /** The x06 exact-cosine baseline arm (the oracle-gated default). */
  val bruteArm: DenseArm = (corpus, queries, armK) =>
    Similarity.bruteForceTopK(corpus, queries, "id", "vec", armK)
      .select(col("q_id"), col("c_id").as("id"), col("rnk").as("vec_rnk"))

  /** `idfWeighted`: the BM25-lite lexical arm (x87). The shared-shingle
    * COUNT ranks a document by how many query shingles it carries —
    * which on a boilerplate corpus means every document ties on the
    * header terms and the df-cap knob must DROP them (a cliff: a term is
    * either fully counted or gone, and the cap's threshold must be
    * re-measured per corpus — SCALING_BOILER.md priced that honestly).
    * BM25's answer is smooth idf damping, and its hash-gatable form is
    * integer halving-buckets: weight(t) = max(1, ⌊log₂ N⌋ − ⌊log₂ df(t)⌋
    * + 1) — exactly representable on both engines as
    * `length(bin(N)) − length(bin(df)) + 1` (no libm, no floats), a
    * staircase of log₂(N/df) + 1. A unique shingle carries ⌊log₂ N⌋ + 1;
    * a header term at df = N carries 1 — damped, never dropped, with NO
    * per-corpus threshold to tune: the weight adapts through N. The
    * ranking score is the integer Σ weights over the shared shingles;
    * the tf saturation and length-normalization terms of full BM25 are
    * deliberately absent (distinct-shingle sets have tf = 1, and the
    * corpus generator emits uniform lengths — both documented knobs, not
    * needed for the damping this arm exists to provide). */
  def hybridRrfTopK(docs: DataFrame, embs: DataFrame, queries: DataFrame,
                    docIdCol: String, textCol: String,
                    vecIdCol: String, vecCol: String,
                    armK: Int, k: Int, rrfC: Int = 60, w: Int = 3,
                    dfCap: Option[Int] = None,
                    idfWeighted: Boolean = false,
                    denseArm: DenseArm = bruteArm): DataFrame = {
    val embIds = embs.select(col(vecIdCol).as("id"))
    // ranked universe: documents that have an embedding
    val corpusDocs = docs.select(col(docIdCol).as("id"), col(textCol).as("text"))
      .join(embIds, Seq("id"), "left_semi")
    val qIds = queries.select(col(docIdCol).as("q_id"))
      .join(embIds.select(col("id").as("q_id")), Seq("q_id"), "left_semi")

    // -- sparse arm: shared-shingle count off the inverted index --------
    val idx = ExtCaches.persistTracked(
      Dedup.shingleIndex(corpusDocs, "id", "text", w, dfCap))
    val qShingles = idx.join(broadcast(qIds), idx("id") === qIds("q_id"))
      .select(col("q_id"), col("shingle"))
    val lexHits = broadcast(qShingles).join(idx, Seq("shingle"))
      .filter(col("id") =!= col("q_id"))
    val lexScored =
      if (!idfWeighted)
        lexHits.groupBy(col("q_id"), col("id"))
          .agg(count(lit(1)).as("n_common"))
      else {
        // per-shingle df off the same stored index; N = ranked universe
        // size as a 1-row broadcast anchor. length(bin(x)) - 1 = floor
        // log2 x, exact integers on both engines.
        val dfRel = idx.groupBy(col("shingle"))
          .agg(count(lit(1)).as("df"))
        val nAnchor = broadcast(corpusDocs.agg(count(lit(1)).as("n_universe")))
        lexHits.join(dfRel, Seq("shingle"))
          .crossJoin(nAnchor)
          .withColumn("idf_w", greatest(lit(1L),
            (length(bin(col("n_universe"))) - length(bin(col("df"))) + 1)
              .cast(LongType)))
          .groupBy(col("q_id"), col("id"))
          .agg(sum(col("idf_w")).as("n_common"))
      }
    val wl = Window.partitionBy(col("q_id")).orderBy(desc("n_common"), col("id"))
    val lex = lexScored
      .withColumn("lex_rnk", row_number().over(wl).cast(LongType))
      .filter(col("lex_rnk") <= armK)
      .select(col("q_id"), col("id"), col("lex_rnk"))

    // -- dense arm: exact cosine top-k over the same universe -----------
    val corpusVecs = embs.select(col(vecIdCol).as("id"), col(vecCol).as("vec"))
      .join(corpusDocs.select(col("id")), Seq("id"), "left_semi")
    val qVecs = corpusVecs.join(broadcast(qIds),
        corpusVecs("id") === qIds("q_id"))
      .select(col("id"), col("vec"))
    val vec = denseArm(corpusVecs, qVecs, armK)

    // -- fusion ---------------------------------------------------------
    val rrf =
      coalesce(lit(1.0) / (lit(rrfC.toDouble) + col("lex_rnk").cast(DoubleType)), lit(0.0)) +
      coalesce(lit(1.0) / (lit(rrfC.toDouble) + col("vec_rnk").cast(DoubleType)), lit(0.0))
    val wf = Window.partitionBy(col("q_id")).orderBy(desc("rrf"), col("id"))
    lex.join(vec, Seq("q_id", "id"), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("rnk", row_number().over(wf).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("id").as("doc_id"),
        col("lex_rnk"), col("vec_rnk"), col("rrf"), col("rnk"))
  }
}
