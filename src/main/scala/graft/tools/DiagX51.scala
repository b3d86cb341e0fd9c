package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.GraftSession
import graft.ext.{ExtCaches, TextOps}
import graft.tables.Tables

/** Round-7 isolation probe for the x51 b30 regression: the round-7
  * persistEager + length-filter change left x51 unchanged on the plain
  * corpus (31-34 s at x30, same as before) but 2-4x slower on the
  * boilerplate b30 dir (82-184 s vs the round-6 code's 31-44 s). The
  * FIRST sweep ran three variants — (lazy, no filter) = round-6 shape
  * 45-81 s, (eager, no filter) 134-138 s, (eager, filter) = then-current
  * 69-73 s — establishing that EVERY eager variant regresses; those
  * numbers survive in the comment at the sweep loop. The sweep below is
  * the two-variant FOLLOW-UP that isolated which eager fill regresses
  * (eager prefix with lazy sets vs fully lazy) and motivated keeping x51
  * fully lazy. Re-running this tool reproduces the follow-up only. */
object DiagX51 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_soak/b30")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    def x51(s: SparkSession, eager: Boolean, lenFilter: Boolean,
            eagerSets: Option[Boolean] = None): DataFrame = {
      val persist: DataFrame => DataFrame =
        if (eager) ExtCaches.persistEager else ExtCaches.persistTracked
      val persistSets: DataFrame => DataFrame =
        if (eagerSets.getOrElse(eager)) ExtCaches.persistEager
        else ExtCaches.persistTracked
      val threshold = 0.5
      val sets = persistSets(Tables.documents(s, dir).select(col("doc_id").as("id"),
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh")))
      val idx = sets.select(col("id"), size(col("sh")).cast(LongType).as("n"),
        explode(col("sh")).as("shingle"))
      val dfTab = idx.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df_count"))
      val byRarity = Window.partitionBy(col("id"))
        .orderBy(col("df_count"), col("shingle"))
      val prefix = persist(
        idx.join(dfTab, Seq("shingle"))
          .withColumn("rnk", row_number().over(byRarity))
          .filter(col("rnk") <= col("n") - ceil(lit(threshold) * col("n")) + lit(1))
          .select(col("id"), col("n"), col("shingle")))
      val joinCond =
        if (lenFilter)
          col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id") &&
            col("b.n").cast(DoubleType) >= col("a.n").cast(DoubleType) * threshold - lit(1e-9) &&
            col("a.n").cast(DoubleType) >= col("b.n").cast(DoubleType) * threshold - lit(1e-9)
        else
          col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id")
      val candidates = prefix.as("a").join(prefix.as("b"), joinCond)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      candidates
        .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("n_common",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast(LongType))
        .withColumn("jaccard",
          col("n_common").cast(DoubleType) /
            (size(col("sh_a")).cast(LongType) + size(col("sh_b")).cast(LongType)
              - col("n_common")).cast(DoubleType))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("n_common"), col("jaccard"))
    }

    // First three shapes measured in the previous sweep (lazy_nofilter
    // 45-81 s, eager_nofilter 134-138 s, eager_filter 69-73 s on b30);
    // this sweep isolates WHICH eager fill regresses: the flat prefix or
    // the array-typed sets.
    for ((label, eager, filt, eagerSets) <- Seq(
        ("eagerPrefix_lazySets_filter", true, true, Some(false)),
        ("lazy_filter", false, true, None));
        rep <- 1 to 2) {
      ExtCaches.clearCaches()
      var rows = -1L
      val t = time { rows = x51(spark, eager, filt, eagerSets).count() }
      println(f"[x51diag] $label%-28s rep$rep ${t}%7.2f s rows=$rows")
    }
    spark.stop()
  }
}
