package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.{ExtCaches, Similarity}
import graft.queries.Extensions
import graft.tables.Tables

/** OPQ-style rotation, the measurement (the one ANN design note left
  * unmeasured after round 10's x76/x77/256-codeword work): product
  * quantization splits dims into m CONTIGUOUS subspaces, so its
  * reconstruction error depends on how variance correlates across that
  * split — OPQ (Ge et al., CVPR'13) learns a rotation to balance it.
  * The deterministic stand-in here is a seed-derived coordinate
  * PERMUTATION applied before the split (a signed permutation is an
  * orthogonal transform — the lightest member of the OPQ family, and
  * the only one that keeps the fixed-point pipeline exactly integer):
  * recall@3 and shortlist coverage for the identity vs three permuted
  * groupings at the shipped 64-codeword rate.
  *
  * Expected on THIS corpus: ≈ no change — the synthetic embedding dims
  * are i.i.d., so every grouping carries the same variance and there
  * is nothing for a rotation to balance. The measurement still earns
  * its keep: it prices the knob (zero extra plan cost — one transform
  * in the quantize projection), demonstrates where it plugs in, and
  * records that the win only exists on CORRELATED real embeddings —
  * the honest claim a production deployment needs before reaching for
  * full learned OPQ. */
object DiagOpq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dims = Extensions.EmbeddingDims
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < Extensions.QuerySetSize)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 3)
      .select(col("q_id"), col("c_id")).cache()
    val nExact = exact.count()
    ExtCaches.clearCaches()
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("q_id"), col("c_id")).join(exact, Seq("q_id", "c_id")).count()

    // Fisher-Yates over the family's shared splitmix64 mixer (ONE
    // spelling — Similarity.splitmix64 — so the diagnostic's draws can
    // never silently diverge from the band-sampling geometry's).
    def permutation(seed: Long): IndexedSeq[Int] = {
      val a = Array.tabulate(dims)(identity)
      for (i <- dims - 1 to 1 by -1) {
        val j = java.lang.Math.floorMod(Similarity.splitmix64(seed + i), i + 1)
        val t = a(i); a(i) = a(j); a(j) = t
      }
      a.toIndexedSeq
    }

    for ((tag, perm) <- Seq(
        ("identity", IndexedSeq.tabulate(dims)(identity)),
        ("perm-seed1", permutation(1L)),
        ("perm-seed2", permutation(2L)),
        ("perm-seed3", permutation(3L)))) {
      val permuted = array(perm.map(i => element_at(col("embedding"), i + 1)): _*)
      val ep = e.select(col("vec_id"), permuted.as("embedding"))
      val qp = ep.filter(col("vec_id") < Extensions.QuerySetSize)
      val top50 = Similarity.pqTopK(ep, qp, "vec_id", "embedding", k = 50,
        m = Extensions.PqM, codes = Extensions.PqCodes,
        lloydRounds = Extensions.PqLloydRounds, dims = dims).cache()
      val r3 = hits(top50.filter(col("rnk") <= 3))
      val c10 = hits(top50.filter(col("rnk") <= 10))
      val c50 = hits(top50)
      println(f"[diagopq] $tag%-11s recall@3 $r3/$nExact  " +
        f"top3⊆ADCtop10 $c10/$nExact  ⊆top50 $c50/$nExact")
      top50.unpersist()
      ExtCaches.clearCaches()
    }

    // ---- The CORRELATED-embedding cell (round-11 verdict #6) ----------
    // The i.i.d. table above shows the rotation CAN'T pay when every
    // grouping carries the same variance. This half shows where it DOES:
    // a corpus whose dims 32..63 are an EXACT COPY of dims 0..31 (the
    // strongest cross-subspace correlation; cosine ordering is unchanged
    // — dot and both norms scale by the same factor, so the i.i.d.
    // ground-truth set is reused verbatim). Under the identity grouping,
    // subspaces 4..7 re-learn byte-for-byte what 0..3 learned (the code
    // budget buys nothing twice); the PAIRING permutation co-locates
    // each dim with its copy, so every subspace quantizes 4 effective
    // dims with the full 64-code book — the OPQ claim (group correlated
    // dims together) in its exactly-measurable form.
    val half = dims / 2
    val corrCols = (0 until half).map(i => element_at(col("embedding"), i + 1))
    val eCorr = e.select(col("vec_id"),
      array(corrCols ++ corrCols: _*).as("embedding"))
    val exactC = Similarity.bruteForceTopK(eCorr,
        eCorr.filter(col("vec_id") < Extensions.QuerySetSize),
        "vec_id", "embedding", 3)
      .select(col("q_id"), col("c_id")).cache()
    val nExactC = exactC.count()
    def hitsC(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("q_id"), col("c_id")).join(exactC, Seq("q_id", "c_id")).count()
    // pairing: slot 2t -> dim t, slot 2t+1 -> its copy half+t
    val pairing = IndexedSeq.tabulate(dims)(j =>
      if (j % 2 == 0) j / 2 else half + j / 2)
    for ((tag, perm) <- Seq(
        ("corr-identity", IndexedSeq.tabulate(dims)(identity)),
        ("corr-pairing", pairing),
        ("corr-seed1", permutation(1L)))) {
      val permuted = array(perm.map(i => element_at(col("embedding"), i + 1)): _*)
      val ep = eCorr.select(col("vec_id"), permuted.as("embedding"))
      val qp = ep.filter(col("vec_id") < Extensions.QuerySetSize)
      val top50 = Similarity.pqTopK(ep, qp, "vec_id", "embedding", k = 50,
        m = Extensions.PqM, codes = Extensions.PqCodes,
        lloydRounds = Extensions.PqLloydRounds, dims = dims).cache()
      val r3 = hitsC(top50.filter(col("rnk") <= 3))
      val c10 = hitsC(top50.filter(col("rnk") <= 10))
      val c50 = hitsC(top50)
      println(f"[diagopq] $tag%-13s recall@3 $r3/$nExactC  " +
        f"top3⊆ADCtop10 $c10/$nExactC  ⊆top50 $c50/$nExactC")
      top50.unpersist()
      ExtCaches.clearCaches()
    }

    // ---- The PLANTED cell (round 12 — the positive-control corpus) ----
    // Clustered ≠ correlated: planted vectors are strongly CLUSTERED
    // (x95–x97 read 1.0 where i.i.d. reads chance) but their dims are
    // conditionally independent given the label (per-(label, dim) signs
    // and magnitudes are separate hash draws), so every subspace
    // grouping carries the same per-cluster structure and the rotation
    // again has nothing to balance. MEASURED (sf0.1): recall@3 is FLAT
    // across groupings — the clustered-≠-correlated point — but LOW
    // (0–1/30, coverage@50 10–14/30), and the low is the cell's second
    // finding: a 64-code-per-subspace PQ codebook separates the 10
    // clusters but cannot ORDER the ~200 near-tie members WITHIN a
    // cluster (the ±1 jitter that defines the true top-3 sits below
    // codebook resolution, so the ADC ranking inside a cluster is
    // arbitrary). The cure is refine DEPTH, not a rotation — priced on
    // the SQ8 family below.
    val eP = graft.ext.Planted.vectors(e.select(col("vec_id")), "vec_id")
      .select(col("vec_id"), col("embedding"))
    val exactP = Similarity.bruteForceTopK(eP,
        eP.filter(col("vec_id") < Extensions.QuerySetSize),
        "vec_id", "embedding", 3)
      .select(col("q_id"), col("c_id")).cache()
    val nExactP = exactP.count()
    def hitsP(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("q_id"), col("c_id")).join(exactP, Seq("q_id", "c_id")).count()
    for ((tag, perm) <- Seq(
        ("planted-identity", IndexedSeq.tabulate(dims)(identity)),
        ("planted-pairing", pairing),
        ("planted-seed1", permutation(1L)))) {
      val permuted = array(perm.map(i => element_at(col("embedding"), i + 1)): _*)
      val ep = eP.select(col("vec_id"), permuted.as("embedding"))
      val qp = ep.filter(col("vec_id") < Extensions.QuerySetSize)
      val top50 = Similarity.pqTopK(ep, qp, "vec_id", "embedding", k = 50,
        m = Extensions.PqM, codes = Extensions.PqCodes,
        lloydRounds = Extensions.PqLloydRounds, dims = dims).cache()
      val r3 = hitsP(top50.filter(col("rnk") <= 3))
      val c10 = hitsP(top50.filter(col("rnk") <= 10))
      val c50 = hitsP(top50)
      println(f"[diagopq] $tag%-16s recall@3 $r3/$nExactP  " +
        f"top3⊆ADCtop10 $c10/$nExactP  ⊆top50 $c50/$nExactP")
      top50.unpersist()
      ExtCaches.clearCaches()
    }

    // Cross-check of the resolution story one compression family up:
    // the SQ8-shortlist graph (x93's form — 8 bits PER DIM, not 6 bits
    // per 8-dim subspace) on the same planted corpus, audited
    // edge-for-edge at growing refine depth. MEASURED (sf0.1): depth 10
    // keeps 1648/6000 = 0.27 of true edges where exact-rank x97 reads
    // 1.0 — x94's "shortlist fidelity ≈ 1" is an I.I.D. fact that does
    // NOT transfer to tightly clustered corpora (a planted cluster is
    // ~200 members inside cosine 0.93–0.97, and a compression-ranked
    // shortlist loses fidelity in proportion to the near-tie cohort it
    // must order). The knob that restores it is refine DEPTH, priced
    // here per cell below — the production rule: shortlist ≥ the
    // expected near-tie cohort, or use the exact-rank build (x89's
    // form, whose ranking exactness is free at graph-build time —
    // precisely its Scaladoc's argument).
    for (sl <- Seq(Extensions.KnnShortlist, 50, 200)) {
      val g93 = Similarity.knnGraphIvfSq8(eP, "vec_id", "embedding",
        k = Extensions.KnnGraphK, cells = Extensions.ScaledCells,
        lloydRounds = Extensions.ScaledLloydRounds,
        nprobe = Extensions.ScaledNprobe, shortlist = sl,
        maxCellSize = Some(Extensions.KnnCellCap))
      val aud = Similarity.graphEdgesRecall(eP, g93, "vec_id", "embedding",
          k = Extensions.KnnGraphK, hitsCol = "hits")
        .agg(sum(col("hits")).as("h"), sum(col("n_exact")).as("n"))
        .collect()(0)
      println(s"[diagopq] planted-sq8graph shortlist=$sl recall@3 " +
        s"${aud.getAs[Long]("h")}/${aud.getAs[Long]("n")}")
      ExtCaches.clearCaches()
    }
    spark.stop()
  }
}
