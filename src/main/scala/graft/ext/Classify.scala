package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Model-based corpus filtering, the deterministic form — the
  * train-a-classifier-on-weak-labels / apply-it-corpus-wide loop that
  * production curation pipelines run with fastText-style linear models
  * (a seed heuristic labels a slice, a cheap text classifier generalizes
  * the judgment to the whole corpus).
  *
  * The model here is a Naive-Bayes VOTE classifier: training computes,
  * per distinct token, its positive/negative document frequencies, and
  * the token's weight is sign(pos_df·N_neg − neg_df·N_pos) ∈ {−1, 0, +1}
  * — the sign of p̂(t|+) − p̂(t|−) computed by integer cross-
  * multiplication, so training AND scoring are exact integer arithmetic
  * end to end (the reason this form is oracle-gatable where a real-
  * valued log-odds model is not: libm log differs across engines in the
  * last ulp, and a hash gate has no tolerance). A document's score is
  * the sum of its distinct tokens' votes; predict positive iff > 0.
  * The real-valued deployment upgrade (smoothed log-odds weights,
  * fastText hashing-trick buckets) changes only the weight expression —
  * the plan shape, and everything this operator proves about it, is
  * identical.
  *
  * Scale shape: training is ONE hash aggregate over the exploded
  * (doc, distinct-token) relation — map-side combinable integer sums —
  * reduced to |vocab| rows, crossed with the 1-row totals anchor
  * (bounded by construction). Apply is an equi-join of the same exploded
  * relation against the |vocab|-row weight table (broadcast when the
  * vocabulary is small; a hashed-bucket vocabulary caps it by
  * construction) and one per-doc sum. No driver-side state, no
  * iteration; the exploded relation is materialized once and feeds both
  * train and apply — in a production train/apply split the weight table
  * is simply persisted between the two jobs.
  */
object Classify {

  /** Train on `df`'s boolean `labelCol` and score every row of `df`
    * (in-sample; a deployment trains on a labeled slice and applies
    * elsewhere — same plan, different inputs).
    *
    * Output: (id, label_pos, n_vocab_tokens, vote_score, predicted_pos),
    * one row per input row — documents with no vocabulary tokens score 0.
    */
  def nbVoteScores(df: DataFrame, idCol: String, labelCol: String,
                   textCol: String): DataFrame = {
    val toks = ExtCaches.persistTracked(
      df.select(col(idCol).as("id"), col(labelCol).as("pos"),
        explode(TextOps.tokens(col(textCol))).as("token"))
        .distinct())
    val totals = df.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg"))
    val weights = toks.groupBy(col("token"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("pos_df"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("neg_df"))
      .crossJoin(broadcast(totals))
      .withColumn("vote",
        when(col("pos_df") * col("n_neg") > col("neg_df") * col("n_pos"), 1L)
          .when(col("pos_df") * col("n_neg") < col("neg_df") * col("n_pos"), -1L)
          .otherwise(0L))
      .select(col("token"), col("vote"))
    val scores = toks.join(weights, Seq("token"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_vocab_tokens"), sum(col("vote")).as("vote_score"))
    df.select(col(idCol).as("id"), col(labelCol).as("label_pos"))
      .join(scores, Seq("id"), "left_outer")
      .select(col("id").as(idCol), col("label_pos"),
        coalesce(col("n_vocab_tokens"), lit(0L)).cast(LongType).as("n_vocab_tokens"),
        coalesce(col("vote_score"), lit(0L)).cast(LongType).as("vote_score"),
        (coalesce(col("vote_score"), lit(0L)) > 0L).as("predicted_pos"))
  }
}
