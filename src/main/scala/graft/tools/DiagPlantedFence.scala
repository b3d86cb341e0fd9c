package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.{ExtCaches, Planted, Similarity}
import graft.tables.Tables

/** The CellFence's banded fallback measured on the corpus class that
  * triggers it — the round-12 PLANS.md scale analysis ("the banded
  * fallback inherits the sign collapse on planted structure, so
  * tightly-clustered corpora need the trained-cell family with caps,
  * not sign banding") converted from an argument into numbers.
  *
  * Four measurements, all on [[graft.ext.Planted]] vectors:
  *
  *  1. **Cell geometry vs quantizer granularity.** Lloyd cell sizes at
  *     cells ∈ {10, 32, 64, 128} over the 10-cluster corpus. This is
  *     the falsifiable premise of the cells-∝-√n remedy: on an integer
  *     clustered corpus, do extra seeds actually SPLIT clusters (max
  *     cell shrinks), or do within-cluster centroids collapse to equal
  *     quantized positions (max cell stays ≈ n/10 and the remedy is
  *     inert)? Whichever way it measures, the production rule inherits
  *     the number.
  *  2. **The quadratic collapse, exactly.** With every cell past the
  *     cap (cap < min cell) and nprobe = 1 (probers == members), the
  *     fallback's distinct candidate pairs should equal
  *     Σ over (cell, planted label) cohorts g·(g−1): within a cohort
  *     every pair collides in EVERY band (CenterMin > JitterMax pins
  *     the signature), across labels a 16-bit sampled band agrees with
  *     probability ≈ 0. The fence's boundedness claim — Σ (cell,
  *     bucket)² ≪ cell² — fails precisely here, because the bucket IS
  *     the cohort.
  *  3. **Max band bucket == max cohort.** The hotBucketCap-style knob
  *     inside the fallback would trip at exactly the same size the
  *     cell cap already tripped at — banding buys no subdivision on
  *     planted structure, only a 16× key-explosion constant.
  *  4. **Fallback-graph recall.** [[Similarity.graphEdgesRecall]] of
  *     the fully-fenced build (every candidate from the banded branch).
  *     Near-dup semantics survive the fallback (same-cohort pairs all
  *     collide — recall loss can only come from Lloyd splitting a
  *     cluster across cells at nprobe = 1), which is the fence's
  *     design contract: correctness degrades gracefully, COST is what
  *     collapses.
  *
  * Usage: runMain graft.tools.DiagPlantedFence [sfDir] [cap] [nOverride] [coarseCells]
  * With nOverride the corpus is spark.range(n) ids (soak-sized cells —
  * cohorts of n/10 trigger a production cap for real) and the recall
  * audits run on a hash-sampled node set per graphEdgesRecall's
  * documented 100 TB knob.
  */
object DiagPlantedFence {
  val K = 3
  val LloydRounds = 2

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cap = args.lift(1).map(_.toInt).getOrElse(20)
    val nOverride = args.lift(2).map(_.toLong)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    val ids = nOverride.fold(
        Tables.embeddings(spark, dir).select(col("vec_id")))(n =>
      spark.range(n).select(col("id").as("vec_id")))
    val pe = ExtCaches.persistTracked(Planted.vectors(ids, "vec_id"))
    val n = pe.count()
    val soak = nOverride.isDefined
    println(s"corpus: ${if (soak) s"range" else dir} n=$n cap=$cap")
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"  [$tag took ${(System.nanoTime() - t0) / 1e9}%.1f s]"); r
    }
    // soak-mode recall audits sample ~400 nodes (graphEdgesRecall's
    // documented 100 TB knob); gate-scale audits run unsampled
    val audit: Option[org.apache.spark.sql.Column] =
      if (soak) Some(graft.ext.Sampling.hashThresholdPredicate(
        col("vec_id"), 400.0 / n)) else None

    val v = Similarity.withNorm(
      pe.select(col("vec_id").as("id"), col("embedding").as("vec")),
      "vec", "norm")
    val q = ExtCaches.persistTracked(v.select(col("id"), col("vec").as("v")))

    // -- 1. cell geometry vs granularity ------------------------------
    def memberCellsAt(cells: Int, nprobe: Int): (DataFrame, DataFrame) = {
      val p = ExtCaches.persistTracked(
        Similarity.trainedCellProbes(q, cells, LloydRounds, nprobe))
      (p.filter(col("probe_rank") === 1)
         .select(col("id").as("nbr_id"), col("cell")),
       p.select(col("id").as("src_id"), col("cell")))
    }
    for (cells <- Seq(10, 32, 64, 128)) {
      val (m, _) = memberCellsAt(cells, 1)
      val sizes = m.groupBy(col("cell")).agg(count(lit(1)).as("g"))
        .agg(count(lit(1)).as("nonempty"), min(col("g")).as("mn"),
          max(col("g")).as("mx")).collect()(0)
      println(s"geometry cells=$cells nonempty=${sizes.getLong(0)} " +
        s"min=${sizes.getLong(1)} max=${sizes.getLong(2)}")
    }

    // -- 2+3. the collapse equality + bucket == cohort -----------------
    val coarse = args.lift(3).map(_.toInt).getOrElse(10)
    val (members, probes) = memberCellsAt(coarse, 1)
    val cohorts = members
      .join(pe.select(col("vec_id").as("nbr_id"), col("label")), Seq("nbr_id"))
      .groupBy(col("cell"), col("label")).agg(count(lit(1)).as("g"))
    val pred = cohorts.agg(
      sum(col("g") * (col("g") - 1)).as("pairs"),
      max(col("g")).as("max_cohort")).collect()(0)
    val fence = new Similarity.CellFence(members, probes, Some(cap))
    val scored = fence.bandedScored(v).get
    val measured = timed("banded candidate count")(scored.count())
    println(s"collapse: fallback distinct pairs=$measured " +
      s"predicted sum g*(g-1)=${pred.getLong(0)} " +
      s"(equal=${measured == pred.getLong(0)})")
    // max (cell, band-key) bucket on the member side vs max cohort
    val keys = v.withColumn("sig", Similarity.signSignature(col("vec"), 64))
      .select(col("id").as("nbr_id"),
        explode(Similarity.sampledKeysFromSig(col("sig"), 16, 16, 64,
          0x5EEDL)).as("bk"))
    val maxBucket = members.join(keys, Seq("nbr_id"))
      .groupBy(col("cell"), col("bk")).agg(count(lit(1)).as("b"))
      .agg(max(col("b"))).collect()(0).getLong(0)
    println(s"buckets: max (cell,band) bucket=$maxBucket " +
      s"max (cell,label) cohort=${pred.getLong(1)} " +
      s"(equal=${maxBucket == pred.getLong(1)})")

    // -- 4. recall of the fully-fenced build ---------------------------
    for (nprobe <- if (soak) Seq(1) else Seq(1, 3)) {
      val g = Similarity.knnGraphIvf(pe, "vec_id", "embedding", k = K,
        cells = coarse, lloydRounds = LloydRounds, nprobe = nprobe,
        maxCellSize = Some(cap))
      val r = timed(s"banded-fenced build+audit nprobe=$nprobe")(
        Similarity.graphEdgesRecall(pe, g, "vec_id", "embedding", K,
            nodePredicate = audit)
          .agg(sum(col("hits")).as("h"), sum(col("n_exact")).as("d"))
          .collect()(0))
      println(s"fallback recall nprobe=$nprobe: ${r.getLong(0)}/${r.getLong(1)}")
    }

    // -- 5. the residual sub-quantizer fallback: bounded candidates,
    //       probe-budget recall ----------------------------------------
    val stats = Similarity.trainedCellStats(q, coarse, LloydRounds)
    // residual-space granularity: the contrast with raw-space inertness —
    // residuals are the jitter, so extra seeds SHOULD split
    val cbar = Similarity.roundedCentroids(stats)
    val rq = members
      .join(v.select(col("id").as("nbr_id"), col("vec")), Seq("nbr_id"))
      .join(broadcast(cbar), Seq("cell"))
      .select(col("nbr_id").as("id"),
        zip_with(col("vec"), col("cbar"), (a, b) => a - b).as("v"))
    for (sc <- if (soak) Seq(64, 256) else Seq(16, 32, 64, 128)) {
      val sub = Similarity.trainedCellStats(rq, sc, LloydRounds)
      val sizes = Similarity.probesFromStats(rq, sub, 1)
        .groupBy(col("cell")).agg(count(lit(1)).as("g"))
        .agg(count(lit(1)).as("nonempty"), max(col("g")).as("mx")).collect()(0)
      println(s"residual geometry sub=$sc nonempty=${sizes.getLong(0)} " +
        s"max=${sizes.getLong(1)}")
    }
    // which cohorts stay glued at sub=64: per (cell,label), the spread of
    // members over sub-cells and the largest single (subcell,label) blob
    val sub64 = Similarity.trainedCellStats(rq, 64, LloydRounds)
    val asg = Similarity.probesFromStats(rq, sub64, 1)
      .select(col("id").as("nbr_id"), col("cell").as("subcell"))
      .join(members, Seq("nbr_id"))
      .join(pe.select(col("vec_id").as("nbr_id"), col("label")), Seq("nbr_id"))
    asg.groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).as("cohort"),
        countDistinct(col("subcell")).as("n_sub"),
        max(lit(1)).as("_"))
      .orderBy(desc("cohort"))
      .collect().take(12).foreach(r =>
        println(s"cohort cell=${r.getLong(0)} label=${r.getLong(1)} " +
          s"n=${r.getLong(2)} subcells=${r.getLong(3)}"))
    val residualArms =
      if (soak) Seq((64, 8), (256, 16)) else Seq((16, 2), (16, 5), (16, 8), (32, 10))
    for ((subCells, subNprobe) <- residualArms) {
      val fence2 = new Similarity.CellFence(members, probes, Some(cap))
      val rs = fence2.residualScored(v, stats, subCells, LloydRounds,
        subNprobe).get
      val nCand = timed(s"residual candidate count sub=$subCells")(rs.count())
      val g = Similarity.knnGraphIvfResidual(pe, "vec_id", "embedding",
        k = K, cells = coarse, lloydRounds = LloydRounds, nprobe = 1,
        maxCellSize = cap, subCells = subCells, subNprobe = subNprobe)
      val r = timed(s"residual build+audit sub=$subCells")(
        Similarity.graphEdgesRecall(pe, g, "vec_id", "embedding", K,
            nodePredicate = audit)
          .agg(sum(col("hits")).as("h"), sum(col("n_exact")).as("d"))
          .collect()(0))
      println(s"residual sub=$subCells probe=$subNprobe: candidates=$nCand " +
        s"(banded=${pred.getLong(0)}) recall=${r.getLong(0)}/${r.getLong(1)}")
    }

    // -- 6. depth-2 recursion: glued merged modes re-split on their own
    //       residuals -------------------------------------------------
    for ((subCells, subNprobe) <- residualArms.takeRight(1)) {
      val fence3 = new Similarity.CellFence(members, probes, Some(cap))
      val deep = fence3.residualScoredDeep(v, stats, subCells, LloydRounds,
        subNprobe, maxDepth = 3).get
      val nCand = timed(s"deep candidate count sub=$subCells")(deep.count())
      val g = Similarity.knnGraphIvfResidual(pe, "vec_id", "embedding",
        k = K, cells = coarse, lloydRounds = LloydRounds, nprobe = 1,
        maxCellSize = cap, subCells = subCells, subNprobe = subNprobe,
        depth = 2)
      val r = timed(s"deep build+audit sub=$subCells")(
        Similarity.graphEdgesRecall(pe, g, "vec_id", "embedding", K,
            nodePredicate = audit)
          .agg(sum(col("hits")).as("h"), sum(col("n_exact")).as("d"))
          .collect()(0))
      println(s"deep2 sub=$subCells probe=$subNprobe: candidates=$nCand " +
        s"recall=${r.getLong(0)}/${r.getLong(1)}")
    }
    spark.stop()
  }
}
