package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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
    * elsewhere — [[nbVoteScoresSplit]], same plan over different
    * inputs).
    *
    * Output: (id, label_pos, n_vocab_tokens, vote_score, predicted_pos),
    * one row per input row — documents with no vocabulary tokens score 0.
    */
  def nbVoteScores(df: DataFrame, idCol: String, labelCol: String,
                   textCol: String): DataFrame = {
    val toks = distinctTokens(df, idCol, textCol,
      Some(col(labelCol).as("pos")))
    val w = trainVotes(df, labelCol, toks)
    applyVotes(df.select(col(idCol).as("id"), col(labelCol).as("label_pos")),
      toks, w, idCol)
  }

  /** The production split: train the vote table on the LABELED `train`
    * slice, score every row of `apply` (whose labels, if any, play no
    * part). Output: (id, n_vocab_tokens, vote_score, predicted_pos) —
    * no label column, because the apply corpus has none; tokens absent
    * from the training vocabulary contribute nothing (they have no
    * weight row — the standard OOV behavior of a fixed-vocab model). */
  def nbVoteScoresSplit(train: DataFrame, apply: DataFrame, idCol: String,
                        labelCol: String, textCol: String): DataFrame = {
    val trainToks = distinctTokens(train, idCol, textCol,
      Some(col(labelCol).as("pos")))
    val w = trainVotes(train, labelCol, trainToks)
    val applyToks = distinctTokens(apply, idCol, textCol, None)
    applyVotes(apply.select(col(idCol).as("id")), applyToks, w, idCol)
  }

  /** Holdout effectiveness of the split classifier — the measurement
    * that makes [[nbVoteScoresSplit]] a curation tool instead of a
    * determinism demo: train on `train`, score `apply`, and confront
    * the predictions with `apply`'s own weak labels (which played NO
    * part in training). Output is ONE row: the integer 2×2 confusion
    * counts (tp/fp/fn/tn over predicted = vote_score > 0 vs the label)
    * and precision / recall / accuracy, each a single IEEE divide of
    * those integers (NULL when its denominator is empty) — the x56
    * matrix discipline, so the whole row hash-gates exactly.
    *
    * Scale shape: [[nbVoteScoresSplit]]'s plan plus one broadcast-sized
    * label join (the apply frame already carries its label column) and
    * one global aggregate — nothing new shuffles. */
  def nbVoteConfusion(train: DataFrame, apply: DataFrame, idCol: String,
                      labelCol: String, textCol: String): DataFrame = {
    val scored = nbVoteScoresSplit(train, apply, idCol, labelCol, textCol)
    val labels = apply.select(col(idCol), col(labelCol).as("label_pos"))
    def rate(num: org.apache.spark.sql.Column,
             den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(den === 0L, lit(null).cast(DoubleType))
        .otherwise(num.cast(DoubleType) / den.cast(DoubleType))
    scored.join(labels, Seq(idCol))
      .agg(
        sum(when(col("label_pos") && col("predicted_pos"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("label_pos") && col("predicted_pos"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("label_pos") && !col("predicted_pos"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("label_pos") && !col("predicted_pos"), 1L).otherwise(0L)).as("tn"))
      .withColumn("precision", rate(col("tp"), col("tp") + col("fp")))
      .withColumn("recall", rate(col("tp"), col("tp") + col("fn")))
      .withColumn("accuracy",
        rate(col("tp") + col("tn"), col("tp") + col("fp") + col("fn") + col("tn")))
  }

  /** Calibrated holdout confusion — [[nbVoteConfusion]] with the ONE
    * change its measurement demands: the decision cut is learned on the
    * TRAINING slice instead of fixed at zero. x86 measured that every
    * token's +1 vote piles onto every document, so the informative
    * margin sits far above zero and `> 0` predicts all-positive; the
    * production form of a score-based filter always calibrates its
    * operating point on labeled training data (the holdout stays
    * untouched — selection on the holdout would be the leakage x53
    * exists to prevent).
    *
    * The calibration is exact integer arithmetic end to end, so it
    * hash-gates: per distinct training score τ, correct(τ) =
    * total_pos − cum_pos(≤ τ) + cum_neg(≤ τ) via ONE cumulative window
    * over the ≤ |distinct scores| aggregated rows (plus a synthetic
    * τ = min−1 row for the all-positive rule); argmax with the smallest-τ
    * tiebreak. Output: one row — the chosen integer `threshold`, the
    * holdout confusion cells at that cut, and the one-divide rates.
    *
    * Scale shape: everything [[nbVoteScoresSplit]] pays, plus one
    * aggregate to |distinct scores| rows, one unpartitioned window OVER
    * THAT REDUCED relation (scores are small integers — bounded by
    * vocabulary hits per doc), and two 1-row broadcast anchors. */
  def nbVoteCalibrated(train: DataFrame, apply: DataFrame, idCol: String,
                       labelCol: String, textCol: String): DataFrame = {
    val trainToks = distinctTokens(train, idCol, textCol,
      Some(col(labelCol).as("pos")))
    // The vote table persists here (round 17, §2.4 value-identical
    // subtrees): unlike the single-consumer forms above, the calibrated
    // form scores BOTH slices against `w`, and its totals anchor scans
    // the raw train relation — unpersisted, the whole training tower
    // (including that scan) executed once per reference. |vocab| rows.
    val w = ExtCaches.persistTracked(trainVotes(train, labelCol, trainToks))
    // trainScores is referenced three times inside calibratedConfusion
    // (score histogram, floor row, totals anchor) — persist the
    // |train|-row scored relation instead of re-running the scoring
    // join per reference.
    val trainScores = ExtCaches.persistTracked(applyVotes(
      train.select(col(idCol).as("id"), col(labelCol).as("label_pos")),
      trainToks, w, idCol))
    val applyToks = distinctTokens(apply, idCol, textCol, None)
    val applyScores = applyVotes(
      apply.select(col(idCol).as("id"), col(labelCol).as("label_pos")),
      applyToks, w, idCol)
    calibratedConfusion(trainScores, applyScores, "vote_score",
      "nbVoteCalibrated")
  }

  /** Real-valued Naive-Bayes LOG-ODDS calibrated classifier — the
    * deployment upgrade [[nbVoteScores]]'s Scaladoc promised, measured
    * (round-12 verdict #6). Weight = Laplace-smoothed Bernoulli-NB
    * log-odds w(t) = ln((pos_df+1)/(n_pos+2)) − ln((neg_df+1)/(n_neg+2));
    * score = Σ w over a document's distinct vocabulary tokens; the
    * decision cut is calibrated on the training slice exactly as in
    * [[nbVoteCalibrated]] (shared [[calibratedConfusion]] tail — the
    * class prior shifts every score equally, so it is absorbed by the
    * threshold and deliberately omitted). SAME plan shape: one weight
    * expression changed, nothing else.
    *
    * Spec-level, NOT oracle-gated: libm log differs across engines in
    * the last ulp and a hash gate has no tolerance — the vote form
    * (x80/x83/x90) stays the gated one; ClassifySpec judges this form
    * on the identical holdout. MEASURED (x90's configuration, the
    * round-12 verdict's #6): holdout accuracy 0.9302 at sf0.01 (n=129,
    * +3 docs over the vote form's 0.9070) and 0.9333 at sf0.1 (n=1290,
    * +1 doc over 0.9326), both far above the 0.74–0.75 all-positive
    * baseline — the real-valued weights win slightly at the small SF
    * and tie at the large one, so the integer vote + calibrated cut
    * already captures nearly all the signal and the hash-gatable form
    * costs ≤ 2.3 % accuracy (QualityGate keeps citing x90; this form
    * is the documented deployment upgrade, now with its number). */
  def nbLogOddsCalibrated(train: DataFrame, apply: DataFrame, idCol: String,
                          labelCol: String, textCol: String): DataFrame = {
    val trainToks = distinctTokens(train, idCol, textCol,
      Some(col(labelCol).as("pos")))
    // Same two persists as [[nbVoteCalibrated]] (round 17): the weight
    // table is scored against twice, trainScores referenced three times.
    val w = ExtCaches.persistTracked(trainLogOdds(train, labelCol, trainToks))
    val trainScores = ExtCaches.persistTracked(applyWeights(
      train.select(col(idCol).as("id"), col(labelCol).as("label_pos")),
      trainToks, w, idCol))
    val applyToks = distinctTokens(apply, idCol, textCol, None)
    val applyScores = applyWeights(
      apply.select(col(idCol).as("id"), col(labelCol).as("label_pos")),
      applyToks, w, idCol)
    calibratedConfusion(trainScores, applyScores, "score",
      "nbLogOddsCalibrated")
  }

  /** The shared calibrate-on-train / confuse-on-holdout tail of
    * [[nbVoteCalibrated]] (integer scores, oracle-gated) and
    * [[nbLogOddsCalibrated]] (double scores, spec-gated): per distinct
    * training score τ, correct(τ) = total_pos − cum_pos(≤ τ) +
    * cum_neg(≤ τ) via ONE cumulative window over the ≤ |distinct
    * scores| aggregated rows (plus a synthetic τ = min−1 all-positive
    * row); argmax with the smallest-τ tiebreak; holdout 2×2 confusion
    * at the chosen cut with one-divide rates. The threshold column's
    * type follows the score column's, so the vote form's gated output
    * is bit-identical to its pre-factoring spelling. */
  private def calibratedConfusion(trainScores: DataFrame,
                                  applyScores: DataFrame, scoreCol: String,
                                  op: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = trainScores.groupBy(col(scoreCol).as("tau"))
      .agg(sum(when(col("label_pos"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("label_pos"), 1L).otherwise(0L)).as("nn"))
    val floorRow = byScore.agg((min(col("tau")) - 1L).as("tau"))
      .withColumn("np", lit(0L)).withColumn("nn", lit(0L))
    val wCum = Window.orderBy(col("tau"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Loud empty-train precondition (round-11 advice): with an empty
    // training slice the min(tau)−1 floor row is NULL-valued and the
    // chosen threshold would silently become a NULL row. Fail in-plan
    // instead — assert_true over the same 1-row totals anchor the
    // calibration already broadcasts (the x59/x84 lazy-guard
    // discipline: constructing the frame costs nothing; the check runs
    // exactly when the query does).
    val tot = broadcast(trainScores
      .agg(sum(when(col("label_pos"), 1L).otherwise(0L)).as("total_pos"),
        count(lit(1)).as("n_train")))
    val best = broadcast(
      byScore.unionByName(floorRow)
        .withColumn("cpos", sum(col("np")).over(wCum))
        .withColumn("cneg", sum(col("nn")).over(wCum))
        .crossJoin(tot)
        .withColumn("correct", col("total_pos") - col("cpos") + col("cneg"))
        .orderBy(desc("correct"), col("tau"))
        .limit(1)
        .select(col("tau").as("threshold"),
          assert_true(col("n_train") > 0L,
            lit(s"$op precondition violated: the training " +
              "slice is empty — no score distribution exists to " +
              "calibrate a threshold on. Widen the train split (or " +
              "train on a labeled corpus) before applying the " +
              "calibrated cut.")).as("train_ok")))
    def rate(num: org.apache.spark.sql.Column,
             den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(den === 0L, lit(null).cast(DoubleType))
        .otherwise(num.cast(DoubleType) / den.cast(DoubleType))
    val pred = col(scoreCol) > col("threshold")
    applyScores.crossJoin(best)
      .filter(col("train_ok").isNull)
      .drop("train_ok")
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("label_pos") && pred, 1L).otherwise(0L)).as("tp"),
        sum(when(!col("label_pos") && pred, 1L).otherwise(0L)).as("fp"),
        sum(when(col("label_pos") && !pred, 1L).otherwise(0L)).as("fn"),
        sum(when(!col("label_pos") && !pred, 1L).otherwise(0L)).as("tn"))
      .withColumn("precision", rate(col("tp"), col("tp") + col("fp")))
      .withColumn("recall", rate(col("tp"), col("tp") + col("fn")))
      .withColumn("accuracy",
        rate(col("tp") + col("tn"), col("tp") + col("fp") + col("fn") + col("tn")))
  }

  /** (id[, pos], distinct token) exploded relation, materialized once —
    * it feeds both training and scoring. */
  private def distinctTokens(df: DataFrame, idCol: String, textCol: String,
                             pos: Option[org.apache.spark.sql.Column]): DataFrame =
    ExtCaches.persistTracked(
      df.select(Seq(col(idCol).as("id")) ++ pos.toSeq :+
          explode(TextOps.tokens(col(textCol))).as("token"): _*)
        .distinct())

  /** The |vocab|-row (token, vote) table: one integer hash aggregate +
    * the 1-row totals anchor. */
  private def trainVotes(train: DataFrame, labelCol: String,
                         trainToks: DataFrame): DataFrame = {
    val totals = train.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg"))
    trainToks.groupBy(col("token"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("pos_df"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("neg_df"))
      .crossJoin(broadcast(totals))
      .withColumn("vote",
        when(col("pos_df") * col("n_neg") > col("neg_df") * col("n_pos"), 1L)
          .when(col("pos_df") * col("n_neg") < col("neg_df") * col("n_pos"), -1L)
          .otherwise(0L))
      .select(col("token"), col("vote"))
  }

  /** The |vocab|-row (token, w) real-valued weight table: the same one
    * hash aggregate + 1-row anchor as [[trainVotes]], with the weight
    * expression swapped for Laplace-smoothed Bernoulli-NB log-odds —
    * ln((pos_df+1)/(n_pos+2)) − ln((neg_df+1)/(n_neg+2)). The smoothing
    * keeps never-seen-in-class tokens finite (the +1/+2 add-one rule),
    * and sign(w) agrees with the vote form's cross-multiplication except
    * where smoothing moves a near-tie across zero. */
  private def trainLogOdds(train: DataFrame, labelCol: String,
                           trainToks: DataFrame): DataFrame = {
    val totals = train.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg"))
    trainToks.groupBy(col("token"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("pos_df"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("neg_df"))
      .crossJoin(broadcast(totals))
      .withColumn("w",
        log((col("pos_df") + 1L).cast(DoubleType) /
            (col("n_pos") + 2L).cast(DoubleType)) -
        log((col("neg_df") + 1L).cast(DoubleType) /
            (col("n_neg") + 2L).cast(DoubleType)))
      .select(col("token"), col("w"))
  }

  /** [[applyVotes]]'s real-valued twin: join the exploded tokens to the
    * (token, w) table, per-doc double sum into `score`, zero-vocabulary
    * rows score 0.0. The double sum's addend order is shuffle-dependent
    * — another reason this form is spec-gated, not hash-gated. */
  private def applyWeights(idFrame: DataFrame, toks: DataFrame,
                           weights: DataFrame, idCol: String): DataFrame = {
    val scores = toks.join(weights, Seq("token"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_vocab_tokens"), sum(col("w")).as("score"))
    val passthrough = idFrame.columns.filter(_ != "id").map(col)
    idFrame.join(scores, Seq("id"), "left_outer")
      .select(Seq(col("id").as(idCol)) ++ passthrough ++ Seq(
        coalesce(col("n_vocab_tokens"), lit(0L)).cast(LongType).as("n_vocab_tokens"),
        coalesce(col("score"), lit(0.0)).cast(DoubleType).as("score")): _*)
  }

  /** Join the exploded tokens to the weight table, sum per doc, restore
    * zero-vocabulary rows via the id frame. `idFrame` carries `id` and
    * optionally `label_pos`. */
  private def applyVotes(idFrame: DataFrame, toks: DataFrame,
                         weights: DataFrame, idCol: String): DataFrame = {
    val scores = toks.join(weights, Seq("token"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_vocab_tokens"), sum(col("vote")).as("vote_score"))
    val passthrough = idFrame.columns.filter(_ != "id").map(col)
    idFrame.join(scores, Seq("id"), "left_outer")
      .select(Seq(col("id").as(idCol)) ++ passthrough ++ Seq(
        coalesce(col("n_vocab_tokens"), lit(0L)).cast(LongType).as("n_vocab_tokens"),
        coalesce(col("vote_score"), lit(0L)).cast(LongType).as("vote_score"),
        (coalesce(col("vote_score"), lit(0L)) > 0L).as("predicted_pos")): _*)
  }
}
