package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.ExtCaches
import graft.tables.Tables

/** Round-17 profile of the weighted BPE trainer (the r16 verdict's #6:
  * "profile whether the distinct-word shuffle or the per-round pair
  * aggregation dominates x110"). Times, separately, at the bench SF:
  *   (a) the SEED — explode corpus tokens → groupBy(word) count (the
  *       distinct-word shuffle) materialized once;
  *   (b) each ROUND — pair statistic + 1-row winner + fold + eager
  *       checkpoint (one Spark job per round by construction);
  *   (c) the final merge-table action (per-round n_tokens_after aggs
  *       over the checkpointed rounds).
  * The split tells which §2 lever (if any) applies.
  */
object DiagX110 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_BPE_K", "6").toInt
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[diagx110] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    import graft.ext.TextOps
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // warm the JVM/codegen on one full pass first
    TextOps.bpeMergeLoopBytes(docs, "doc_id", "text", 1).count()
    ExtCaches.clearCaches()
    // (a) seed: the distinct-word shuffle (same relation the loop seeds
    // with — spelled via the loop at k = 0... not exposed; inline it)
    val seed = docs
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[\\p{L}\\p{N}]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        concat(regexp_extract_all(lower(hex(encode(col("word"), "UTF-8"))),
          lit(".."), lit(0)), array(lit("</w>"))).as("t"))
    time("seed shuffle (materialize)") {
      seed.write.format("noop").mode("overwrite").save()
    }
    val n = seed.count()
    println(s"[diagx110] distinct words: $n")
    // (b)+(c): full loop per k, timed cumulatively round by round
    for (kk <- 1 to k) {
      ExtCaches.clearCaches()
      time(s"full loop k=$kk") {
        TextOps.bpeMergeLoopBytes(docs, "doc_id", "text", kk).count()
      }
    }
    spark.stop()
  }
}
