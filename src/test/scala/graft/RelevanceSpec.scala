package graft

import org.apache.spark.sql.functions._
import graft.ext.Relevance

/** Specs for the x98 planted-relevance harness: the twin generator's
  * exactness envelope and the hit-row semantics, independent of the
  * oracle hash gate. */
class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),
    (1L, "one two three four five six seven"),
    (7L, "beyond the query set entirely")).toDF("doc_id", "text")

  private val embs = Seq(
    (0L, Array.fill(64)(0.25f)),
    (1L, Array.tabulate(64)(i => if (i % 2 == 0) 0.5f else -0.5f)),
    (7L, Array.fill(64)(-0.125f))).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))

  test("twinDocs: offset ids, kept tokens are a subsequence, queries only") {
    val twins = Relevance.twinDocs(docs, "doc_id", "text", nQueries = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twins.keySet == Set(Relevance.TwinIdOffset, Relevance.TwinIdOffset + 1),
      s"doc 7 is outside the query set: $twins")
    for ((id, text) <- twins) {
      val srcText = docs.filter(col("doc_id") === id - Relevance.TwinIdOffset)
        .select(col("text")).first().getString(0)
      val src = srcText.split(" ").toSeq
      val kept = text.split(" ").filter(_.nonEmpty).toSeq
      // kept tokens appear in source order (value-based drop of a
      // distinct-token doc = subsequence)
      assert(kept.forall(src.contains), s"twin $id invented tokens: $kept")
      assert(kept == src.filter(kept.contains(_)), s"twin $id reordered: $kept")
    }
  }

  test("twinDocs: hash draws use the SOURCE id (lateral-alias regression)") {
    // Recompute the expected keep decision for doc 0's first token with
    // the portable u16 primitive keyed by the SOURCE id 0 — if the
    // generator ever hashes the offset id again (the bug the x98 gate
    // caught on first contact), this pins it at unit level.
    val twin = Relevance.twinDocs(docs, "doc_id", "text", nQueries = 1)
      .select(col("text")).first().getString(0)
    def u16(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString, 16)
    val expected = "alpha beta gamma delta epsilon zeta".split(" ")
      .filter(t => u16(s"qt|0|$t") % Relevance.TokenKeepMod != 0L).mkString(" ")
    assert(twin == expected, s"got '$twin', expected '$expected'")
  }

  test("twinEmbs: dyadic jitter within ±JitterNum/JitterDenom, exact in double") {
    val twins = Relevance.twinEmbs(embs, "vec_id", "embedding", nQueries = 2)
    val rows = twins.collect()
    assert(rows.map(_.getLong(0)).toSet ==
      Set(Relevance.TwinIdOffset, Relevance.TwinIdOffset + 1))
    val src = embs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (r <- rows) {
      val s = src(r.getLong(0) - Relevance.TwinIdOffset)
      val t = r.getSeq[Double](1)
      val diffs = s.zip(t).map { case (a, b) => b - a }
      assert(diffs.forall(d =>
        math.abs(d) <= Relevance.JitterNum / Relevance.JitterDenom + 1e-15),
        s"jitter out of envelope: ${diffs.max}")
      // dyadic: 64·d is an exact integer (float + k/64 is exact in double)
      assert(diffs.forall(d => (d * Relevance.JitterDenom).isWhole),
        s"non-dyadic jitter: ${diffs.find(d => !(d * 64).isWhole)}")
      assert(diffs.exists(_ != 0.0), "jitter is identically zero")
    }
  }

  test("hitsAtK counts rank-1 / top-k / per-arm twin hits against the anchor") {
    // Two queries; q0's twin fused at rank 1 via both arms, q1's twin at
    // fused rank 3 with only the dense arm ranking it.
    val off = Relevance.TwinIdOffset
    val fused = Seq(
      (0L, off + 0L, Some(1L), Some(1L), 1L),
      (0L, 5L, Some(2L), None, 2L),
      (1L, 6L, Some(1L), Some(1L), 1L),
      (1L, 8L, Some(2L), Some(2L), 2L),
      (1L, off + 1L, None, Some(3L), 3L))
      .toDF("q_id", "doc_id", "lex_rnk", "vec_rnk", "rnk")
    val queries = Seq(0L, 1L).toDF("doc_id")
    val row = Relevance.hitsAtK("t", fused, queries, k = 2).first()
    assert(row.getAs[Long]("n_queries") == 2L)
    assert(row.getAs[Long]("hits_at_1") == 1L) // q0 only
    assert(row.getAs[Long]("hits_at_k") == 1L) // q1's twin at rank 3 > k=2
    assert(row.getAs[Long]("hits_lex") == 1L)  // q1's twin lex-missing
    assert(row.getAs[Long]("hits_vec") == 2L)  // both twins dense-ranked
    assert(row.getAs[Double]("hit_rate") == 0.5)
  }

  test("x98 registry row shape at sf0.001: exact arms are the positive control") {
    val out = graft.queries.Extensions.x98_retrieval_relevance(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 4)
    val byArm = out.map(r => r.getString(0) -> r).toMap
    assert(byArm.keySet == Set("1_brute", "2_ivf_sq8", "3_ivf_pq", "4_bm25_brute"))
    for (r <- out) assert(r.getAs[Long]("n_queries") == 50L)
    // the exact dense arm must always contain the twin (cos ≈ 0.71 vs
    // 0.49 max background): the harness's positive control
    assert(byArm("1_brute").getAs[Long]("hits_vec") == 50L)
    assert(byArm("4_bm25_brute").getAs[Long]("hits_vec") == 50L)
    // compressed arms can only lose dense hits vs exact, never gain
    assert(byArm("2_ivf_sq8").getAs[Long]("hits_vec") <= 50L)
    assert(byArm("3_ivf_pq").getAs[Long]("hits_vec") <= 50L)
  }
}
