package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.GraftSession
import graft.ext.{ExtCaches, Planted, Similarity}
import graft.queries.Extensions
import graft.tables.Tables

/** NN-descent (Dong et al., WWW'11) measured on BOTH sides of its
  * structural regime — the half of the round-11 rejection the planted
  * corpus (round-12 verdict #1) makes falsifiable. Round 11 prototyped
  * the descent from the banded seed on the real corpus and REJECTED it
  * with numbers (14/1500 → converges at 20/1500 by round 2): i.i.d.-dim
  * embeddings have no navigable neighborhood structure. The open
  * question that leaves: is the descent INERT, or was there nothing to
  * descend? This tool answers it with the structured-vs-i.i.d. pair:
  * the same descent, from a deliberately WEAK hash-random seed (k
  * arbitrary neighbors per node — the banded seed is already perfect
  * on planted structure, x96 = 1.0, so it can't show climbing), run on
  * the planted corpus and on the same ids' i.i.d. embeddings.
  *
  * The prediction (and the measured outcome recorded in PLANS.md): on
  * planted structure a node's best-of-candidates quickly finds ONE
  * same-cluster neighbor (cosine ≈ 0.95 dominates every cross-cluster
  * score), after which neighbors-of-neighbors are same-cluster and the
  * graph self-improves to ≈ exact — the navigability NN-descent
  * assumes; on i.i.d. embeddings the same iterations stay ≈ flat near
  * the random-seed floor, reproducing the round-11 rejection from a
  * different seed. One algorithm, two corpora, opposite verdicts —
  * which is exactly the evidence that the round-11 "no" was about the
  * corpus, not a broken implementation.
  *
  * Prototype-scale (the descent is driver-iterated like the CC
  * fixpoint; candidates per node bounded by (k + rcap)² + k). Usage:
  * runMain graft.tools.DiagNnd [sfDir] [rounds]
  */
object DiagNnd {
  val K = 3
  /** Reverse-neighbor cap per node (Dong's sampling knob). */
  val RCap = 3

  private def u16(s: org.apache.spark.sql.Column) =
    conv(substring(md5(s), 1, 4), 16, 10).cast(LongType)

  /** k hash-random seed edges per node over the id universe [0, n). */
  def randomSeed(v: DataFrame, n: Long, k: Int): DataFrame =
    v.select(col("id").as("src_id"),
        explode(array((0 until k).map(j =>
          u16(concat(lit(s"nnd|$j|"), col("id").cast(StringType))) % n): _*))
          .as("nbr_id"))
      .filter(col("src_id") =!= col("nbr_id"))
      .distinct()

  /** One measured descent: per-round recall@K of the evolving graph
    * against the exact per-node top-K. Returns the per-round hit
    * counts. `v` = withNorm output (id, vec, norm). */
  def descend(v: DataFrame, n: Long, rounds: Int): Seq[(Int, Long)] = {
    val vv = ExtCaches.persistTracked(v)
    val exact = {
      val a = vv.select(col("id").as("src_id"), col("vec").as("vs"), col("ns_"))
      // exact top-K: brute pairs via the quantized kernel
      val b = vv.select(col("id").as("nbr_id"), col("vec").as("vn"), col("nn_"))
      val w = Window.partitionBy(col("src_id")).orderBy(desc("cosine"), col("nbr_id"))
      a.join(b, col("src_id") =!= col("nbr_id"))
        .withColumn("cosine", Similarity.cosineFromParts(
          Similarity.dotQ(col("vs"), col("vn")), col("ns_"), col("nn_")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= K)
        .select(col("src_id"), col("nbr_id"))
    }
    val exactSet = ExtCaches.persistTracked(exact)
    val nExact = exactSet.count()

    def score(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("src_id")).orderBy(desc("cosine"), col("nbr_id"))
      cand
        .join(vv.select(col("id").as("src_id"), col("vec").as("vs"), col("ns_")), Seq("src_id"))
        .join(vv.select(col("id").as("nbr_id"), col("vec").as("vn"), col("nn_")), Seq("nbr_id"))
        .withColumn("cosine", Similarity.cosineFromParts(
          Similarity.dotQ(col("vs"), col("vn")), col("ns_"), col("nn_")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= K)
        .select(col("src_id"), col("nbr_id"))
    }

    var g = score(randomSeed(vv.select(col("id")), n, K)).localCheckpoint(true)
    val out = Seq.newBuilder[(Int, Long)]
    out += 0 -> g.join(exactSet, Seq("src_id", "nbr_id"), "left_semi").count()
    for (r <- 1 to rounds) {
      // capped reverse edges (hash-ranked for determinism)
      val wr = Window.partitionBy(col("src_id"))
        .orderBy(u16(concat(col("src_id").cast(StringType), lit("|"),
          col("nbr_id").cast(StringType))), col("nbr_id"))
      val rev = g.select(col("nbr_id").as("src_id"), col("src_id").as("nbr_id"))
        .withColumn("rr", row_number().over(wr)).filter(col("rr") <= RCap)
        .select(col("src_id"), col("nbr_id"))
      val und = g.unionByName(rev).distinct()
      val hop2 = und.as("a")
        .join(und.as("b"), col("a.nbr_id") === col("b.src_id"))
        .select(col("a.src_id").as("src_id"), col("b.nbr_id").as("nbr_id"))
        .filter(col("src_id") =!= col("nbr_id"))
      val cand = g.unionByName(hop2).distinct()
      g = score(cand).localCheckpoint(true)
      out += r -> g.join(exactSet, Seq("src_id", "nbr_id"), "left_semi").count()
    }
    out.result().map { case (r, h) => (r, h) } :+ (-1, nExact)
  }

  def withNormed(e: DataFrame): DataFrame =
    Similarity.withNorm(
        e.select(col("vec_id").as("id"), col("embedding").as("vec")),
        "vec", "norm")
      .select(col("id"), col("vec"), col("norm").as("ns_"), col("norm").as("nn_"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, dir)
    val n = e.count()
    for ((tag, corpus) <- Seq(
        ("iid", e.select(col("vec_id"), col("embedding"))),
        ("planted", Planted.vectors(e.select(col("vec_id")), "vec_id")
          .select(col("vec_id"), col("embedding"))))) {
      val cells = descend(withNormed(corpus), n, rounds)
      val nExact = cells.last._2
      cells.dropRight(1).foreach { case (r, h) =>
        println(f"[diagnnd] $tag%-8s round $r: recall@$K = $h/$nExact = ${h.toDouble / nExact}%.4f")
      }
      ExtCaches.clearCaches()
    }
    spark.stop()
  }
}
