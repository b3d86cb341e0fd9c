package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.Exact.sumRevenueD
import graft.tables.Tables

/** Round-7 diagnostic for the q06 driver-bench regression (VERDICT r6 #2:
  * 2.12 s → 5.83 s in the driver run while q05 got FASTER in the same
  * run). q06 is the only headline query with two explicit full-data
  * repartitions, making it maximally exposed to shuffle-side contention —
  * this A/B times the four exchange layouts on an idle machine so the
  * repartition decision rests on recorded numbers, not round-5 folklore.
  * Results land in PLANS.md (q06 section). */
object DiagQ06 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // The query body, parameterized on which explicit exchanges to keep.
    // Mirrors Chinook.q06_top_part_per_cust minus the final dimension
    // joins' ORDER BY (kept — it is part of the measured query).
    def q06(s: SparkSession, repartJoin: Boolean, repartAgg: Boolean): DataFrame = {
      val li0 = Tables.lineitem(s, dir)
      val li = if (repartJoin) li0.repartition(col("l_orderkey")) else li0
      val joined = li.join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      val pre = if (repartAgg)
        joined.repartition(col("o_custkey"), col("l_partkey")) else joined
      val agg = pre.groupBy(col("o_custkey"), col("l_partkey"))
        .agg(sumRevenueD.as("revenue"))
      val top = agg.groupBy(col("o_custkey"))
        .agg(max_by(
          struct(col("l_partkey"), col("revenue")),
          struct(col("revenue"), (-col("l_partkey")).as("nk"))).as("top"))
        .select(col("o_custkey"), col("top.l_partkey"), col("top.revenue"))
      val custCountry = Tables.customer(s, dir)
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name").as("country"))
      top
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .join(custCountry, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name").as("customer"),
          col("p_name").as("track"), col("p_partkey"), col("revenue"))
        .orderBy(col("c_custkey"))
    }

    val variants = Seq(
      "both_repartitions" -> ((true, true)),
      "join_exchange_only" -> ((true, false)),
      "agg_exchange_only" -> ((false, true)),
      "no_explicit_exchange" -> ((false, false)))
    // JVM/codegen warmup on each variant once before timing.
    variants.foreach { case (_, (a, b)) => q06(spark, a, b).count() }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    for ((label, (a, b)) <- variants) {
      val ts = (1 to reps).map(_ => time(q06(spark, a, b).count()))
      println(f"[q06] $label%-22s median=${median(ts)}%.2f " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
