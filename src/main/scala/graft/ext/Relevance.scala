package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Planted retrieval-relevance ground truth (x98) — the round-11
  * verdict's #3: the retrieval ladder (x79 brute / x84 IVF×SQ8 / x87
  * BM25-lite / x88 IVF×PQ) had cost soaks and a ranking-DIFFERENCE
  * count but no statement of which ranking is BETTER, because the
  * corpus has no relevance labels. This generator plants them: each
  * query doc `s` (the [[graft.queries.Extensions.RelevanceQueries]]
  * lowest ids) gets a PERTURBED TWIN at id `s + TwinIdOffset` added to
  * the corpus — its text with hash-dropped tokens, its embedding with
  * bounded dyadic jitter — and "relevant to query s" is defined as
  * "retrieves the twin of s". hit@k over the fused top-k is then an
  * oracle-gatable integer per arm, and the BM25-vs-raw and
  * compressed-vs-exact questions become numbers instead of arguments.
  *
  * Perturbation calibration (measured on the real corpus, sf0.01):
  * embedding coordinates have E[x²] ≈ 0.016 and the per-query MAX
  * background cosine is 0.49 (mean 0.37). Jitter is uniform on
  * {−JitterNum..JitterNum}/JitterDenom per dim — E[j²] ≈ 0.016 at
  * 14/64, so cos(twin, source) ≈ 1/√2 ≈ 0.71: far enough above the
  * 0.49 background that the EXACT arm should always hit (the positive
  * control), close enough that the compressed arms' probe and
  * code-resolution losses become visible. Text keeps a token VALUE
  * when u16("qt|" id "|" tok) % TokenKeepMod ≠ 0 (≈ 3/4 of values), so
  * ≈ (3/4)³ ≈ 42 % of the source's 3-token shingles survive in the
  * twin — well above cross-doc background overlap, but low enough that
  * the corpus's own planted near-dups can compete at rank 1.
  *
  * Exactness (both engines bit-agree): every draw is the portable
  * md5-u16 primitive shared with [[Planted]]; jitter values are dyadic
  * (multiples of 1/64), a float coordinate widened to double plus a
  * dyadic jitter is EXACT in double (≤ 30 significand bits in play),
  * and the downstream fixed-point quantization sees identical doubles.
  * Twin text is the kept-token sequence rejoined with single spaces —
  * re-tokenizing it yields exactly the kept sequence, so the lexical
  * index needs no special casing.
  *
  * Scale shape: twins are a pure per-row projection over the
  * |queries|-row slice — no shuffle, no state; the union with the
  * corpus is a scan-level concat. At 100 TB the query set stays
  * bounded and the harness's cost is the arms', not the ground
  * truth's.
  */
object Relevance {
  /** Twin ids live 10^9 above the corpus id space — disjoint from every
    * driver corpus (max doc_id ≈ 10^5 at sf10) and from the query set,
    * so the arms' self-exclusion filters (`c_id ≠ q_id`) never touch a
    * twin and `fused.doc_id = q_id + TwinIdOffset` identifies the
    * relevant doc with no extra mapping relation. */
  val TwinIdOffset = 1000000000L
  /** Embedding jitter: j ∈ {−JitterNum..JitterNum}/JitterDenom per dim
    * (dyadic, exact in double). 14/64 puts cos(twin, source) ≈ 0.71 on
    * the real corpus — see the calibration note above. */
  val JitterNum = 14L
  val JitterDenom = 64.0
  /** A token value survives when u16 % TokenKeepMod ≠ 0 — keep ≈ 3/4. */
  val TokenKeepMod = 4L

  /** Perturbed twin documents of the `nQueries` lowest doc ids:
    * (idCol + TwinIdOffset, kept-token text). Hash draws use the
    * SOURCE id, so the oracle replays them without the offset — the id
    * is renamed to `src` BEFORE the offset projection because both
    * engines resolve a lateral column alias in preference to the
    * relation's own column: a draw spelled against `idCol` in the same
    * SELECT that re-aliases it would silently hash the OFFSET id
    * (caught by the x98 gate on first contact). */
  def twinDocs(docs: DataFrame, idCol: String, textCol: String,
               nQueries: Int): DataFrame =
    docs.filter(col(idCol) < nQueries)
      .select(col(idCol).as("src"), col(textCol))
      .select((col("src") + TwinIdOffset).as(idCol),
        array_join(
          filter(TextOps.tokens(col(textCol)), t =>
            Planted.u16(concat(lit("qt|"), col("src").cast(StringType),
              lit("|"), t)) % TokenKeepMod =!= 0L),
          " ").as(textCol))

  /** Perturbed twin embeddings of the `nQueries` lowest vec ids:
    * (idCol + TwinIdOffset, double embedding + dyadic jitter). The
    * source float coordinates are widened to double FIRST (exact), so
    * the union corpus must carry double embeddings — the caller widens
    * the original table the same way. */
  def twinEmbs(embs: DataFrame, idCol: String, vecCol: String,
               nQueries: Int): DataFrame =
    embs.filter(col(idCol) < nQueries)
      .select(col(idCol).as("src"), col(vecCol))
      .select((col("src") + TwinIdOffset).as(idCol),
        transform(col(vecCol), (x, d) =>
          x.cast(DoubleType) +
            (Planted.u16(concat(lit("qe|"), col("src").cast(StringType),
              lit("|"), d.cast(StringType)))
              % (2L * JitterNum + 1L) - JitterNum).cast(DoubleType)
              / JitterDenom).as(vecCol))

  /** One integer relevance row for an arm, over the UNCUT fusion (every
    * shortlist row, ≤ 2·armK per query — the caller passes the fused
    * relation before the top-k cut so the per-arm columns are readable):
    *  - hits_at_1 / hits_at_k: the twin at fused rank 1 / within the
    *    fused top `k` — the end-to-end number (RRF's robustness means
    *    one strong arm can carry a miss in the other; that masking IS
    *    the fusion's value and is measured as such);
    *  - hits_lex / hits_vec: the twin inside the LEXICAL / DENSE arm's
    *    own armK-shortlist — the isolated arm numbers that adjudicate
    *    BM25-vs-raw (hits_lex across lexical variants) and
    *    compressed-vs-exact (hits_vec across dense variants).
    * `nQueries` is a 1-row count anchor over the actual query set
    * (broadcast, the allowlisted form), so the row is honest when a
    * scale factor carries fewer query docs than configured. */
  /** One integer relevance row for a kNN-GRAPH arm (x102–x104, the
    * round-12 verdict's #4: the graph builders carried recall-vs-exact
    * audits but no planted relevance number). Input is a graph edge
    * list (src_id, nbr_id, cosine, rnk) built over the twin-augmented
    * corpus; a hit is the query's OWN twin
    * (nbr_id = src_id + TwinIdOffset) appearing among the query's
    * edges — at rank 1 (hits_at_1) or anywhere in its top `k`
    * (hits_at_k). Same shape and count anchor as [[hitsAtK]], minus
    * the per-arm shortlist columns (a graph has one candidate
    * generator, not a lexical/dense pair). The `queries` semi-join
    * restricts to query sources: the twins' own outgoing edges and
    * the rest of the corpus are not scored rows. */
  def graphHitsAtK(arm: String, edges: DataFrame, queries: DataFrame,
                   idCol: String, k: Int): DataFrame = {
    val isTwin = col("nbr_id") === col("src_id") + TwinIdOffset
    edges
      .join(broadcast(queries.select(col(idCol).as("src_id"))),
        Seq("src_id"), "left_semi")
      .agg(
        count(when(isTwin && col("rnk") === 1L, lit(1))).as("hits_at_1"),
        count(when(isTwin && col("rnk") <= k, lit(1))).as("hits_at_k"))
      .crossJoin(broadcast(queries.agg(count(lit(1)).as("n_queries"))))
      .select(lit(arm).as("arm"), col("n_queries"),
        col("hits_at_1").cast(LongType).as("hits_at_1"),
        col("hits_at_k").cast(LongType).as("hits_at_k"),
        (col("hits_at_k").cast(DoubleType) /
          col("n_queries").cast(DoubleType)).as("hit_rate"))
  }

  def hitsAtK(arm: String, fused: DataFrame, nQueries: DataFrame,
              k: Int): DataFrame = {
    val isTwin = col("doc_id") === col("q_id") + TwinIdOffset
    fused
      .agg(
        count(when(isTwin && col("rnk") === 1L, lit(1))).as("hits_at_1"),
        count(when(isTwin && col("rnk") <= k, lit(1))).as("hits_at_k"),
        count(when(isTwin && col("lex_rnk").isNotNull, lit(1))).as("hits_lex"),
        count(when(isTwin && col("vec_rnk").isNotNull, lit(1))).as("hits_vec"))
      .crossJoin(broadcast(nQueries.agg(count(lit(1)).as("n_queries"))))
      .select(lit(arm).as("arm"), col("n_queries"),
        col("hits_at_1").cast(LongType).as("hits_at_1"),
        col("hits_at_k").cast(LongType).as("hits_at_k"),
        col("hits_lex").cast(LongType).as("hits_lex"),
        col("hits_vec").cast(LongType).as("hits_vec"),
        (col("hits_at_k").cast(DoubleType) /
          col("n_queries").cast(DoubleType)).as("hit_rate"))
  }
}
