package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Streaming analytics over the events table (SURVEY.md §2.9).
  *
  * The reference workload is batch-only; these operators extend the
  * engine with the Structured Streaming surface a large-scale pipeline
  * needs. Every transform below is expressed on a plain DataFrame, so the
  * SAME function serves batch (events.parquet → finite DataFrame) and
  * streaming (readStream → unbounded DataFrame) — Spark's unified
  * Dataset API is exactly this: `window`/`session_window` aggregate both.
  *
  * Batch runs of these transforms are what the DuckDB oracle checks
  * (graft.queries.Extensions x12/x13); streaming behavior (watermarks,
  * late-data drop, incremental state) is covered by MemoryStream tests —
  * there is no oracle for a watermark.
  *
  * Scale: windowed aggregation shuffles by (window, key) — bounded state
  * per watermark; session windows use Spark's session-merge state store.
  * sum(value) is cast per-row to DECIMAL so partial aggregates merge
  * exactly in any order (same policy as graft.ops.Exact).
  */
object EventStreams {
  private def decSum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast(DecimalType(18, 6)))

  /** Tumbling-window event counts + exact value sums per event type. */
  def tumblingStats(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        decSum("value").cast(DoubleType).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding-window variant (width, slide). */
  def slidingStats(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        decSum("value").cast(DoubleType).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Per-user session windows with the given inactivity gap. A session's
    * end is last-event-time + gap (Spark session_window semantics). */
  def userSessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        decSum("value").cast(DoubleType).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming form: watermarked tumbling aggregation — late events older
    * than `lateness` are dropped and state is evicted past the watermark.
    * Append this to a readStream source; batch callers use tumblingStats. */
  def watermarkedTumblingStats(stream: DataFrame, width: String,
                               lateness: String): DataFrame =
    tumblingStats(stream.withWatermark("ts", lateness), width)

  /** Streaming session windows with watermarked state eviction. */
  def watermarkedUserSessions(stream: DataFrame, gap: String,
                              lateness: String): DataFrame =
    userSessions(stream.withWatermark("ts", lateness), gap)

  /** Streaming exact deduplication: emit each event_id once, keeping
    * dedup state only within the watermark horizon (a duplicate arriving
    * later than `lateness` after the original is outside the state window
    * — the bounded-state trade every infinite-stream dedup must make).
    * The batch analog is dropDuplicates / Dedup.exactDupGroups. */
  def dedupedEvents(stream: DataFrame, lateness: String): DataFrame =
    stream.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: every click within `horizon` before a
    * purchase by the same user (streaming attribution — the unbounded
    * analog of the batch as-of query x15, with interval rather than
    * latest-only semantics). Both sides carry watermarks, and the time
    * bound `c.ts ∈ (p.ts − horizon, p.ts)` lets Spark evict join state
    * once the watermark passes a row's match window — without the bound,
    * stream-stream join state grows forever. */
  def streamingAttribution(purchases: DataFrame, clicks: DataFrame,
                           horizon: String, lateness: String): DataFrame = {
    val p = purchases.withWatermark("ts", lateness)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", lateness)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") < col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Stream-STATIC join: enrich an unbounded event stream with a bounded
    * dimension (event_type → attributes) before aggregating. The static
    * side is stateless — Spark broadcasts (or re-scans) it per micro-
    * batch, no join state, no watermark needed on the dimension. This is
    * the dimension-enrichment shape every streaming pipeline starts with;
    * at cluster scale the dimension broadcasts once per batch and the
    * stream never shuffles for the join. Aggregation after the join is
    * the usual watermarked tumbling window. */
  def enrichedTypeStats(stream: DataFrame, typeDim: DataFrame,
                        width: String, lateness: String): DataFrame =
    stream.withWatermark("ts", lateness)
      .join(broadcast(typeDim), Seq("event_type"))
      .groupBy(window(col("ts"), width).as("w"), col("category"))
      .agg(count(lit(1)).as("n_events"),
        decSum("value").cast(DoubleType).as("total_value"))
      .select(col("w.start").as("window_start"), col("category"),
        col("n_events"), col("total_value"))

  // --- custom stateful processing (flatMapGroupsWithState) ---------------

  case class Event(ts: java.sql.Timestamp, user_id: Long, event_type: String,
                   value: Double)
  case class UserActivity(user_id: Long, n_events: Long, n_purchases: Long,
                          last_ts: java.sql.Timestamp)

  /** Custom-state example: per-user running activity with purchase counts,
    * maintained incrementally across micro-batches. Demonstrates the
    * KeyValueGroupedDataset.flatMapGroupsWithState surface the engine
    * exposes for semantics windows can't express (e.g. churn flags that
    * depend on arbitrary per-key history). ProcessingTimeTimeout keeps
    * state bounded. */
  def runningUserActivity(events: Dataset[Event]): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserActivity, UserActivity](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserActivity]) =>
          val evs = batch.toSeq
          if (evs.isEmpty) Iterator.empty
          else {
            val prev = state.getOption.getOrElse(
              UserActivity(userId, 0L, 0L, new java.sql.Timestamp(0L)))
            val next = UserActivity(
              userId,
              prev.n_events + evs.size,
              prev.n_purchases + evs.count(_.event_type == "purchase"),
              evs.map(_.ts).maxBy(_.getTime))
            state.update(next)
            Iterator.single(next)
          }
      }
  }

  /** The same per-user running activity on the transformWithState API —
    * Spark 4's arbitrary-stateful-processing surface (typed state
    * variables with per-variable TTL, timers, composable ValueState/
    * ListState/MapState) that supersedes flatMapGroupsWithState. Requires
    * the RocksDB state store provider (ships with the Spark distribution;
    * the spec sets `spark.sql.streaming.stateStore.providerClass`).
    * Keeping both forms shows the migration is a processor-class swap —
    * the pipeline around it is unchanged. */
  class RunningActivityProcessor
    extends StatefulProcessor[Long, Event, UserActivity] {
    @transient private var state: ValueState[UserActivity] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserActivity](
        "activity", Encoders.product[UserActivity], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[UserActivity] = {
      val evs = rows.toSeq
      if (evs.isEmpty) Iterator.empty
      else {
        val prev =
          if (state.exists()) state.get()
          else UserActivity(userId, 0L, 0L, new java.sql.Timestamp(0L))
        val next = UserActivity(
          userId,
          prev.n_events + evs.size,
          prev.n_purchases + evs.count(_.event_type == "purchase"),
          evs.map(_.ts).maxBy(_.getTime))
        state.update(next)
        Iterator.single(next)
      }
    }
  }

  def runningUserActivityTws(events: Dataset[Event]): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningActivityProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
