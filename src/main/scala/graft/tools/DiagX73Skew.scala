package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

import graft.GraftSession
import graft.ext.{ExtCaches, Similarity}
import graft.queries.Extensions
import graft.tables.Tables

/** Round-9 verdict stretch #7: does trained-cell IVF (x73/x76) need
  * x29-style skew accounting when the corpus piles into one cell?
  *
  * Construction: the skewed corpus collapses HALF of every embedding
  * table row onto one constant direction (a deterministic ramp — the
  * vectors quantize identically, so Lloyd training MUST capture them in
  * a single cell), the other half keeps its real vector. The uniform
  * corpus is the table as shipped. For both, the tool reports the
  * trained cell-population profile (max/mean member count), the
  * candidate volume the probe join produces (Σ over queries of probed
  * cells' members — the scored-row count), the wall time of the full
  * x73 search (3 cold reps), and whether the probe join planned as a
  * broadcast hash join (it must: the skew question only concerns
  * SHUFFLE joins, which AQE skew-split can rescue — a broadcast join
  * streams the corpus side under whatever partitioning the scan
  * produced, so a hot CELL never concentrates into a hot TASK).
  * The PLANS.md capture of this output is the stretch item's "measured
  * statement, either way". */
object DiagX73Skew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_soak/x10")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val plain = Tables.embeddings(spark, dir)
    val hot = transform(sequence(lit(1), lit(Extensions.EmbeddingDims)),
      d => (lit(1.0) / d.cast("double")).cast(FloatType))
    val skewed = plain.withColumn("embedding",
      when(pmod(col("vec_id"), lit(2)) === 0, hot).otherwise(col("embedding")))

    def profile(name: String, e: DataFrame): Unit = {
      val q = ExtCaches.persistTracked(e.select(col("vec_id").as("id"),
        Similarity.quantize(col("embedding")).as("v")))
      val probes = ExtCaches.persistTracked(Similarity.trainedCellProbes(
        q, Extensions.ScaledCells, Extensions.ScaledLloydRounds,
        Extensions.ScaledNprobe))
      val pops = probes.filter(col("probe_rank") === 1)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("mx"), avg(col("n")).as("mean"),
          count(lit(1)).as("cells"))
        .collect()(0)
      // candidate volume = Σ over (query, probed cell) of that cell's pop
      val qprobes = probes.join(
        broadcast(e.filter(col("vec_id") < Extensions.QuerySetSize)
          .select(col("vec_id").as("id"))), Seq("id"))
      val cand = qprobes.join(
          probes.filter(col("probe_rank") === 1)
            .select(col("cell"), col("id").as("m_id")), Seq("cell"))
        .count()
      println(f"[skew] $name%-8s cells=${pops.getLong(2)} " +
        f"maxPop=${pops.getLong(0)} meanPop=${pops.getDouble(1)}%.1f " +
        s"candidateRows=$cand")
      ExtCaches.clearCaches()
      val times = (1 to 3).map { _ =>
        ExtCaches.clearCaches()
        val t0 = System.nanoTime()
        Similarity.ivfSq8TopKScaled(e,
          e.filter(col("vec_id") < Extensions.QuerySetSize),
          "vec_id", "embedding", k = 3, cells = Extensions.ScaledCells,
          lloydRounds = Extensions.ScaledLloydRounds,
          nprobe = Extensions.ScaledNprobe).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[skew] $name%-8s x73 cold reps " +
        times.map(t => f"$t%.2f").mkString("/") + " s")
      val plan = Similarity.ivfSq8TopKScaled(e,
        e.filter(col("vec_id") < Extensions.QuerySetSize),
        "vec_id", "embedding", k = 3, cells = Extensions.ScaledCells,
        lloydRounds = Extensions.ScaledLloydRounds,
        nprobe = Extensions.ScaledNprobe)
        .queryExecution.executedPlan.toString
      println(s"[skew] $name probe join broadcast-hash=" +
        plan.contains("BroadcastHashJoin") +
        " shuffle-hash=" + plan.contains("ShuffledHashJoin") +
        " sort-merge=" + plan.contains("SortMergeJoin"))
      ExtCaches.clearCaches()
    }
    profile("uniform", plain)
    profile("skewed", skewed)
    spark.stop()
  }
}
