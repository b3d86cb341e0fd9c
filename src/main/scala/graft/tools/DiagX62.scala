package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.GraftSession
import graft.ext.{Dedup, ExtCaches}
import graft.tables.Tables

/** x62 candidate-filter selectivity audit — the round-8 verdict asked for
  * candidate : verified : emitted counts instead of an unmeasured claim
  * that the prefix filter is "selective enough". Prints, for the sf dir in
  * arg 1 (default sf0.1), both candidate-generation forms over the same
  * corpus and constants as the registry's x62 (k=8, q=5):
  *
  *   - `asym` — the round-8 shape: each doc's (k·q+1)-prefix grams joined
  *     against the partner's FULL gram set (recall-safe with no
  *     coordination lemma, but candidate cost carries df_full(g));
  *   - `prefpref` — the round-9 shape now in [[Dedup.editDistancePairs]]:
  *     prefix × prefix under the same global (df, gram) order, plus the
  *     low-diversity brute arm that closes the short/repetitive-doc
  *     recall hole.
  *
  * For each: raw candidate join rows (pre-distinct — what the join
  * physically materializes), distinct candidate pairs (what verification
  * pays), and emitted pairs (ED ≤ k survivors). The verified set must be
  * identical between forms — both are recall-exact — so the emitted
  * counts double as an equivalence check. Findings are recorded in
  * PLANS.md ("x62 candidate selectivity"). */
object DiagX62 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (k, q) = (8, 5)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    val docs = ExtCaches.persistTracked(
      Tables.documents(spark, dir).select(col("doc_id").as("id"),
        col("text"), length(col("text")).as("len")))
    val withGrams = docs.withColumn("grams",
      array_distinct(when(col("len") >= q,
        transform(sequence(lit(0), col("len") - q),
          i => col("text").substr(i + lit(1), lit(q))))
        .otherwise(array(col("text")))))
      .withColumn("n_grams", size(col("grams")))
    val idx = ExtCaches.persistTracked(
      withGrams.filter(col("n_grams") > lit(k * q))
        .select(col("id"), col("len"), explode(col("grams")).as("gram")))
    val dfTab = idx.groupBy(col("gram")).agg(count(lit(1)).as("df_count"))
    val byRarity = Window.partitionBy(col("id"))
      .orderBy(col("df_count"), col("gram"))
    val prefix = ExtCaches.persistTracked(idx.join(dfTab, Seq("gram"))
      .withColumn("rnk", row_number().over(byRarity))
      .filter(col("rnk") <= lit(k * q + 1))
      .select(col("id"), col("len"), col("gram")))

    def candJoin(b: DataFrame): DataFrame = prefix.as("a")
      .join(b.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id")
          && abs(col("a.len") - col("b.len")) <= lit(k))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    def verified(cand: DataFrame): Long = cand
      .join(docs.select(col("id").as("id_a"), col("text").as("t_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("text").as("t_b")), Seq("id_b"))
      .filter(levenshtein(col("t_a"), col("t_b"), k).cast(LongType) >= 0)
      .count()

    def report(label: String, raw: DataFrame): Unit = {
      val rawN = raw.count()
      val dist = raw.distinct()
      val distN = dist.count()
      val emitN = verified(dist)
      println(f"[diagx62] $label raw_candidates=$rawN distinct_candidates=$distN emitted=$emitN")
    }

    report("asym", candJoin(idx))
    val lowDiv = withGrams.filter(col("n_grams") <= lit(k * q))
      .select(col("id"), col("len"),
        floor(col("len") / k).cast(LongType).as("lb"))
    val bruteArm = lowDiv
      .select(col("id"), col("len"),
        explode(array(col("lb") - 1, col("lb"), col("lb") + 1)).as("lbk"))
      .as("a")
      .join(docs.select(col("id"), col("len"),
          floor(col("len") / k).cast(LongType).as("lbk")).as("b"),
        col("a.lbk") === col("b.lbk") && col("a.id") =!= col("b.id")
          && abs(col("a.len") - col("b.len")) <= lit(k))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
    report("prefpref", candJoin(prefix).unionByName(bruteArm))
    println(s"[diagx62] low_diversity_docs=${lowDiv.count()} " +
      s"corpus=${docs.count()}")

    // End-to-end wall time of the shipped operator, warm caches dropped
    // first so the number is the honest cold cost.
    ExtCaches.clearCaches()
    val t0 = System.nanoTime()
    val n = Dedup.editDistancePairs(Tables.documents(spark, dir),
      "doc_id", "text", k, q).count()
    println(f"[diagx62] shipped_operator pairs=$n cold_s=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
