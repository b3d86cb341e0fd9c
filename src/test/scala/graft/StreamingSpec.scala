package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming specs (SURVEY.md §2.9): windowed aggregation over
  * an unbounded source, watermark-driven late-data handling, and custom
  * state via flatMapGroupsWithState. No DuckDB oracle exists for streaming
  * semantics — these MemoryStream suites are the gate. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumblingStats over a stream emits per-window per-type stats") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[Event]
    source.addData(
      Event(ts(1), 1L, "click", 1.0),
      Event(ts(2), 2L, "click", 2.0),
      Event(ts(11), 1L, "view", 5.0))
    val q = EventStreams
      .watermarkedTumblingStats(source.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val r = spark.table("tumbling")
      .orderBy("window_start", "event_type").collect()
      .map(x => (x.getTimestamp(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (ts(0), "click", 2L, 3.0),
      (ts(10), "view", 1L, 5.0)))
  }

  test("x12 file-stream run equals the batch twin end-to-end (oracle gate twin)") {
    // The registry query x12_events_tumbling_stream executes the SAME
    // tumblingStats transform through a real file readStream (landing-dir
    // symlink → maxFilesPerTrigger micro-batches → foreachBatch parquet
    // sink) and is oracle-gated by the driver against the identical DuckDB
    // SQL as the batch twin. This spec pins the equality locally so a
    // regression fails fast, not only at driver verify time.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val batch = graft.queries.Extensions.x12_events_tumbling(spark, dir)
    val stream = graft.queries.Extensions.x12_events_tumbling_stream(spark, dir)
    assert(batch.count() > 0)
    assert(batch.exceptAll(stream).count() == 0L)
    assert(stream.exceptAll(batch).count() == 0L)
  }

  test("x13 append-mode stream equals the batch twin, including on a MULTI-FILE table with no cross-file time order") {
    // The session twin's hard cases: (a) append mode must emit every real
    // session exactly once (the punctuation event closes the tail), and
    // (b) a directory-layout events table replays its part files in mtime
    // order with NO cross-file time order — under a tight watermark
    // horizon, any event older than a previous file's max would be
    // silently dropped as late and sessions would split or shrink. The
    // replay-wide horizon (Extensions.ReplayLateness) is what makes (b)
    // correct; this spec builds exactly that adversarial layout (sessions
    // hash-scattered across 4 part files) and pins stream == batch on it.
    val srcDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$srcDir/events.parquet").exists())
    val tmp = java.nio.file.Files.createTempDirectory("graft_x13_multifile_")
    val events = spark.read.parquet(s"$srcDir/events.parquet")
    events.repartition(4, org.apache.spark.sql.functions.col("event_id"))
      .write.parquet(s"$tmp/events.parquet")
    for (dir <- Seq(srcDir, tmp.toString)) {
      val batch = graft.queries.Extensions.x13_events_sessions(spark, dir)
      val stream = graft.queries.Extensions.x13_events_sessions_stream(spark, dir)
      assert(batch.count() > 0)
      assert(batch.exceptAll(stream).count() == 0L, s"missing sessions ($dir)")
      assert(stream.exceptAll(batch).count() == 0L, s"extra sessions ($dir)")
    }
  }

  test("per-row featurization ops run unchanged on a stream (ingest-time scoring)") {
    // The x08–x10 text operators are pure per-row expressions, so the SAME
    // functions serve batch featurization and stream-ingest scoring — the
    // property that lets a 100 TB pipeline score documents as they land
    // instead of re-scanning the corpus. Stateless → append mode, no
    // watermark, no state store.
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[String]
    source.addData("the quick brown fox and the lazy dog", "!!!")
    val q = graft.ext.TextOps.langId(
        graft.ext.TextOps.qualityScore(source.toDF().withColumnRenamed("value", "text")))
      .select("text", "quality_score", "predicted_lang")
      .writeStream.format("memory").queryName("scored").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val r = spark.table("scored").orderBy(org.apache.spark.sql.functions.desc("quality_score"))
      .collect().map(x => (x.getDouble(1), x.getString(2)))
    assert(r.length == 2 && r(0)._1 > r(1)._1 && r(0)._2 == "en")
  }

  test("blocklist scrub runs unchanged on a stream (ingest-time redaction)") {
    // scrubTerms is a stateless per-row projection, so the SAME function
    // redacts documents as they land — the compliance property that
    // released bytes never touch storage unscrubbed. Append mode, no
    // state store.
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    source.addData((1L, "the customer sat"), (2L, "nothing to redact"))
    val q = graft.ext.TextOps.scrubTerms(
        source.toDF().toDF("doc_id", "text"), "doc_id", "text",
        Seq("customer"), "<MASK>")
      .writeStream.format("memory").queryName("scrubbed").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val r = spark.table("scrubbed").orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("n_hits")).toSeq == Seq(1L, 0L))
    assert(r(0).getAs[Long]("n_chars_scrubbed") == "the <MASK> sat".length.toLong)
  }

  test("token-window chunking runs unchanged on a stream (ingest-time packing)") {
    // chunkTokens is a stateless 1:N generator (sequence + slice +
    // posexplode) — the pack-as-documents-land counterpart of the
    // scoring test above. Append mode, no state store.
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    source.addData((1L, (1 to 11).map("t" + _).mkString(" ")), (2L, ""))
    val q = graft.ext.TextOps.chunkTokens(
        source.toDF().toDF("doc_id", "text"), "doc_id", "text",
        chunkSize = 5, stride = 3)
      .writeStream.format("memory").queryName("chunked").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val r = spark.table("chunked").orderBy("doc_id", "chunk_id").collect()
    // 11 tokens, size 5, stride 3 → 4 chunks; the empty doc emits nothing
    assert(r.map(_.getAs[Long]("doc_id")).forall(_ == 1L))
    assert(r.map(_.getAs[Long]("chunk_id")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(r.map(_.getAs[Long]("chunk_tokens")).toSeq == Seq(5L, 5L, 5L, 2L))
  }

  test("stream-static join enriches the stream with a broadcast dimension") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[Event]
    val dim = Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue")).toDF("event_type", "category")
    source.addData(
      Event(ts(1), 1L, "click", 1.0),
      Event(ts(2), 2L, "view", 2.0),
      Event(ts(3), 1L, "purchase", 10.0))
    val q = EventStreams
      .enrichedTypeStats(source.toDF(), dim, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val r = spark.table("enriched")
      .orderBy("window_start", "category").collect()
      .map(x => (x.getTimestamp(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (ts(0), "engagement", 2L, 3.0),
      (ts(0), "revenue", 1L, 10.0)))
  }

  test("watermark drops events later than the allowed lateness") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[Event]
    val q = EventStreams
      .watermarkedTumblingStats(source.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    // batch 1 establishes watermark at 40:00 − 5min = 35:00 → window
    // [00:00,10:00) is final and emitted on the next trigger
    source.addData(Event(ts(1), 1L, "click", 1.0), Event(ts(40), 2L, "view", 1.0))
    q.processAllAvailable()
    // batch 2: an event at 10:02 is older than the watermark → dropped
    source.addData(Event(ts(2), 3L, "click", 9.0))
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("late").collect()
      .map(x => (x.getTimestamp(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    // the finalized [00:00,10:00) click window must contain ONLY batch-1
    assert(emitted.contains((ts(0), "click", 1L, 1.0)))
    assert(!emitted.contains((ts(0), "click", 2L, 10.0)))
  }

  test("userSessions (batch form) merges events within the gap") {
    val events = Seq(
      Event(ts(0), 1L, "click", 1.0),
      Event(ts(20), 1L, "view", 2.0),  // 20min gap < 30 → same session
      Event(ts(55), 1L, "click", 3.0), // 35min gap ≥ 30 → new session
      Event(ts(5), 2L, "view", 4.0)).toDF()
    val r = EventStreams.userSessions(events, "30 minutes")
      .orderBy("user_id", "session_start").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1), x.getTimestamp(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, ts(0), ts(50), 2L),  // end = last event 10:20 + 30min
      (1L, ts(55), Timestamp.valueOf("2024-01-01 11:25:00"), 1L),
      (2L, ts(5), ts(35), 1L)))
  }

  test("watermarkedUserSessions emits finalized sessions on an unbounded stream") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[Event]
    val q = EventStreams
      .watermarkedUserSessions(source.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    // session: two events 3 min apart; then an event far ahead advances
    // the watermark past session end + gap → session finalizes
    source.addData(Event(ts(0), 7L, "click", 1.0), Event(ts(3), 7L, "view", 2.0))
    q.processAllAvailable()
    source.addData(Event(ts(59), 8L, "click", 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess_stream").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Long]("n_events")))
    assert(rows.toSeq == Seq((7L, ts(0), ts(13), 2L))) // end = last event + gap
  }

  test("dedupedEvents drops duplicate event ids across micro-batches") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val stream = source.toDF().toDF("ts", "event_id", "value")
    val q = EventStreams.dedupedEvents(stream, "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    source.addData((ts(1), 100L, 1.0), (ts(2), 100L, 2.0), (ts(3), 101L, 3.0))
    q.processAllAvailable()
    source.addData((ts(4), 100L, 4.0), (ts(5), 102L, 5.0)) // 100 is a dup
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id")).sorted
    assert(ids.toSeq == Seq(100L, 101L, 102L))
  }

  test("streamingAttribution joins clicks within the horizon, drops older ones") {
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStreams.streamingAttribution(
        purchases.toDF().withColumn("event_id",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts"))),
        clicks.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    clicks.addData(
      Event(ts(0), 1L, "click", 0.0),   // 31 min before → outside horizon
      Event(ts(20), 1L, "click", 0.0),  // inside horizon
      Event(ts(25), 2L, "click", 0.0))  // other user
    purchases.addData(Event(ts(31), 1L, "purchase", 9.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("attr").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("c_ts")))
    assert(rows.toSeq == Seq((1L, ts(20))))
  }

  test("foreachBatch parquet sink: append-mode windows land exactly once") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val source = MemoryStream[Event]
    // append mode + watermark: a window row is emitted exactly once, on
    // the trigger after the watermark passes its end — the transactional
    // sink shape (idempotent-by-batchId in production; parquet append
    // here, each finalized window appearing in exactly one batch).
    val q = EventStreams
      .watermarkedTumblingStats(source.toDF(), "10 minutes", "5 minutes")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("append").parquet(s"$dir/batch_$batchId")
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    source.addData(Event(ts(1), 1L, "click", 1.0), Event(ts(2), 2L, "click", 2.0))
    q.processAllAvailable()
    source.addData(Event(ts(40), 3L, "view", 1.0)) // advances watermark past 10:10
    q.processAllAvailable()
    source.addData(Event(ts(59), 4L, "view", 1.0)) // no newly-final window
    q.processAllAvailable(); q.stop()
    val written = spark.read.parquet(
      new java.io.File(dir).listFiles().map(_.toString): _*)
    val rows = written.collect()
      .map(x => (x.getAs[Timestamp]("window_start"), x.getAs[String]("event_type"),
        x.getAs[Long]("n_events"), x.getAs[Double]("total_value")))
    // the [10:00,10:10) click window was finalized once, with both events,
    // and appears exactly once across all written batches
    assert(rows.count(r => r._1 == ts(0) && r._2 == "click") == 1, rows.toSeq)
    assert(rows.contains((ts(0), "click", 2L, 3.0)), rows.toSeq)
  }

  test("exactly-once across a crash: checkpoint restart replays the failed batch, idempotent sink absorbs it") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_eo_sink_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_eo_ckpt_").toString
    val source = MemoryStream[Event]
    // The production sink contract this spec proves end-to-end: foreachBatch
    // may run a batchId TWICE (once before a crash that prevents the offset
    // commit, once on replay after restart), so the write must be
    // idempotent BY BATCH ID — overwrite of a batch-addressed location (or
    // a transactional MERGE keyed on batchId), never blind append. The
    // sinkLog records every invocation so the test can prove the replay
    // actually happened, not just that nothing duplicated.
    val sinkLog = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    @volatile var crashArmed = false
    val sink = (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        batchId: Long) => {
      val n = batch.count()
      sinkLog.synchronized { sinkLog += ((batchId, n)) }
      if (n > 0) batch.write.mode("overwrite").parquet(s"$dir/batch_$batchId")
      if (crashArmed && n > 0) {
        crashArmed = false
        // Output is on disk but the micro-batch will NOT commit its
        // offsets — exactly the torn state a real executor/driver crash
        // between sink write and commit leaves behind.
        throw new RuntimeException("injected crash after sink write")
      }
    }
    def start() = EventStreams
      .watermarkedTumblingStats(source.toDF(), "10 minutes", "5 minutes")
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    source.addData(Event(ts(1), 1L, "click", 1.0), Event(ts(2), 2L, "click", 2.0))
    q1.processAllAvailable()
    crashArmed = true
    source.addData(Event(ts(40), 3L, "view", 1.0)) // watermark past 10:10 → finalizes the click window
    val crashed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(crashed.getMessage.contains("injected crash"), crashed.getMessage)

    val q2 = start() // same checkpoint, same source: resumes from last COMMITTED offset
    q2.processAllAvailable()
    source.addData(Event(ts(59), 4L, "view", 1.0)) // extra batch after recovery
    q2.processAllAvailable(); q2.stop()

    // The failed batch id ran twice (crash then replay) with the same rows…
    val emitting = sinkLog.synchronized(sinkLog.filter(_._2 > 0).toList)
    val replayed = emitting.groupBy(_._1).filter(_._2.size >= 2)
    assert(replayed.nonEmpty, s"no batch was replayed: $sinkLog")
    assert(replayed.values.forall(_.map(_._2).distinct.size == 1),
      s"replay produced different row counts: $sinkLog")
    // …yet every finalized window landed exactly once.
    val written = spark.read.parquet(
      new java.io.File(dir).listFiles().map(_.toString): _*)
    val rows = written.collect()
      .map(x => (x.getAs[Timestamp]("window_start"), x.getAs[String]("event_type"),
        x.getAs[Long]("n_events"), x.getAs[Double]("total_value")))
    assert(rows.count(r => r._1 == ts(0) && r._2 == "click") == 1, rows.toSeq)
    assert(rows.contains((ts(0), "click", 2L, 3.0)), rows.toSeq)
  }

  test("runningUserActivity maintains state across micro-batches") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[Event]
    val q = EventStreams.runningUserActivity(source.toDS())
      .writeStream.format("memory").queryName("activity")
      .outputMode("update").start()
    source.addData(Event(ts(1), 1L, "purchase", 10.0), Event(ts(2), 1L, "click", 0.0))
    q.processAllAvailable()
    source.addData(Event(ts(3), 1L, "purchase", 20.0))
    q.processAllAvailable(); q.stop()
    val updates = spark.table("activity").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // batch 1 update: 2 events 1 purchase; batch 2 update: 3 events 2 purchases
    assert(updates.contains((1L, 2L, 1L)))
    assert(updates.contains((1L, 3L, 2L)))
  }

  test("transformWithState processor matches the flatMapGroupsWithState semantics") {
    implicit val ctx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val source = MemoryStream[Event]
      val q = EventStreams.runningUserActivityTws(source.toDS())
        .writeStream.format("memory").queryName("activity_tws")
        .outputMode("update").start()
      source.addData(Event(ts(1), 1L, "purchase", 10.0), Event(ts(2), 1L, "click", 0.0))
      q.processAllAvailable()
      source.addData(Event(ts(3), 1L, "purchase", 20.0))
      q.processAllAvailable(); q.stop()
      val updates = spark.table("activity_tws").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      assert(updates.contains((1L, 2L, 1L)))
      assert(updates.contains((1L, 3L, 2L)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

/** x65 end-to-end: the doubled-landing replay really converges to the
  * single-copy batch aggregate (the oracle identity, proven in-engine at
  * sf0.001 so the gate doesn't depend on DuckDB availability). */
class StreamDedupReplaySpec extends SparkSpec {
  test("x65 replayed-twice ingest equals the single-copy batch aggregate") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.queries.Extensions.x65_stream_dedup_replay(spark, dir)
    val batch = graft.tables.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("total_value"))
      .orderBy(col("event_type"))
    assert(streamed.exceptAll(batch).count() == 0L)
    assert(batch.exceptAll(streamed).count() == 0L)
    assert(batch.count() > 0L)
  }
}

/** Streaming incremental LSH (round-9 stretch): the x55 batch answer
  * reproduced by a transformWithState pipeline whose band index is
  * STREAMING STATE seeded from the base corpus — and the within-stream
  * half (an incoming doc deduped against an EARLIER incoming doc across
  * a micro-batch boundary) that the batch-vs-base form cannot express. */
class StreamIncLshSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.functions._
  import graft.streaming.DedupStreams

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream output equals the batch x55 answer on the same base/incoming split (sf0.001)") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      import spark.implicits._
      val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      val inBase = graft.ext.Sampling.hashThresholdPredicate(
        col("doc_id"), graft.queries.Extensions.BaseFrac)
      val base = docs.filter(inBase)
      val incoming = docs.filter(!inBase)
      val batch = graft.ext.Dedup.incrementalLshPairs(
          base, incoming, "doc_id", "text",
          w = 3, perms = 16, bands = 4,
          threshold = graft.queries.Extensions.JaccardThreshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      graft.ext.ExtCaches.clearCaches()

      val source = MemoryStream[(Long, String)]
      val stream = DedupStreams.lshDedupStream(
          source.toDF().toDF("doc_id", "text"), base, "doc_id", "text",
          w = 3, perms = 16, bands = 4,
          threshold = graft.queries.Extensions.JaccardThreshold)
      val q = stream.writeStream.format("memory").queryName("inc_lsh")
        .outputMode("append").start()
      // two micro-batches: state must carry the seeded index across them.
      // (No stream-side dedup: a pair's multi-band emissions carry
      // identical values and collapse in the result Set below — the
      // registry twin dedupes per batch in its sink.)
      val rows = incoming.select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val (h1, h2) = rows.splitAt(rows.length / 2)
      source.addData(h1.toSeq: _*); q.processAllAvailable()
      source.addData(h2.toSeq: _*); q.processAllAvailable()
      q.stop()
      val got = spark.table("inc_lsh").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch.nonEmpty, "degenerate spec: batch answer is empty")
      assert(got == batch, s"stream=$got batch=$batch")
      graft.ext.ExtCaches.clearCaches()
    }
  }

  test("appendIncoming: a dup arriving in a later micro-batch is caught against an earlier STREAM doc") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      import spark.implicits._
      val base = Seq((100L, "alpha beta gamma delta epsilon zeta eta"))
        .toDF("doc_id", "text")
      val d1 = "one two three four five six seven eight nine ten"
      val source = MemoryStream[(Long, String)]
      val stream = DedupStreams.lshDedupStream(
          source.toDF().toDF("doc_id", "text"), base, "doc_id", "text",
          w = 3, perms = 16, bands = 4, threshold = 0.5,
          appendIncoming = true)
      val q = stream.writeStream.format("memory").queryName("inc_lsh_append")
        .outputMode("append").start()
      source.addData((1L, d1)); q.processAllAvailable()          // batch 1
      source.addData((2L, d1)); q.processAllAvailable()          // batch 2: exact dup of 1
      q.stop()
      val got = spark.table("inc_lsh_append").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // doc 2 must match STREAM doc 1 (jaccard 1.0) — state carried the
      // batch-1 doc across the boundary; nothing matches the unrelated base
      assert(got == Set((2L, 1L, 1.0)), got)
      graft.ext.ExtCaches.clearCaches()
    }
  }

  /** Run a tiny base + two-batch stream through lshDedupStream with the
    * given knobs and return the emitted match set. */
  private def runTiny(base: Seq[(Long, String)],
                      batch1: Seq[(Long, String)], batch2: Seq[(Long, String)],
                      name: String, appendIncoming: Boolean = false,
                      cap: Option[Int] = None,
                      ttl: Option[java.time.Duration] = None): Set[(Long, Long, Double)] =
    withRocksDb {
      implicit val ctx = spark.sqlContext
      import spark.implicits._
      val source = MemoryStream[(Long, String)]
      val stream = DedupStreams.lshDedupStream(
          source.toDF().toDF("doc_id", "text"),
          base.toDF("doc_id", "text"), "doc_id", "text",
          w = 3, perms = 16, bands = 4, threshold = 0.5,
          appendIncoming = appendIncoming, hotBucketCap = cap, stateTtl = ttl)
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      source.addData(batch1: _*); q.processAllAvailable()
      source.addData(batch2: _*); q.processAllAvailable()
      q.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      graft.ext.ExtCaches.clearCaches()
      got
    }

  private val dupText = "one two three four five six seven eight nine ten"
  private val otherText = "alpha beta gamma delta epsilon zeta eta theta"

  test("hotBucketCap: under-cap output is UNCHANGED (x59 discipline)") {
    val base = Seq((100L, dupText), (200L, otherText))
    val b1 = Seq((1L, dupText)); val b2 = Seq((2L, otherText))
    val uncapped = runTiny(base, b1, b2, "lsh_uncapped")
    assert(uncapped == Set((1L, 100L, 1.0), (2L, 200L, 1.0)), uncapped)
    // exact dups share every band bucket, so each seed bucket holds ≤ 2
    // members — cap 2 is a no-op and the output must be identical
    assert(runTiny(base, b1, b2, "lsh_capped", cap = Some(2)) == uncapped)
  }

  test("stateTtl: processing-time mode + native member TTL produce the unchanged answer before expiry") {
    // TTL queries run CONTINUOUS empty micro-batches (the engine must
    // advance the eviction clock), so processAllAvailable never settles
    // — poll the sink for the expected answer instead (the production
    // form runs a real processing-time trigger; see lshDedupStream doc).
    withRocksDb {
      implicit val ctx = spark.sqlContext
      import spark.implicits._
      val source = MemoryStream[(Long, String)]
      val stream = DedupStreams.lshDedupStream(
          source.toDF().toDF("doc_id", "text"),
          Seq((100L, dupText)).toDF("doc_id", "text"), "doc_id", "text",
          w = 3, perms = 16, bands = 4, threshold = 0.5,
          stateTtl = Some(java.time.Duration.ofHours(1)))
      val q = stream.writeStream.format("memory").queryName("lsh_ttl")
        .outputMode("append").start()
      try {
        source.addData((1L, dupText))
        val deadline = System.currentTimeMillis + 120000
        def got(): Set[(Long, Long, Double)] = spark.table("lsh_ttl").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        while (got() != Set((1L, 100L, 1.0)) &&
          System.currentTimeMillis < deadline) Thread.sleep(200)
        assert(got() == Set((1L, 100L, 1.0)), got())
      } finally q.stop()
      graft.ext.ExtCaches.clearCaches()
    }
  }

  test("hotBucketCap: a bucket past the cap SATURATES — state cleared, no pairs from it (batch drop semantics)") {
    // three exact dups in the base share ALL four band buckets → every
    // bucket seeds with 3 members > cap 2 → saturated at seed; the
    // incoming exact dup must emit NOTHING (the batch guard drops hot
    // buckets before the candidate join)
    val base = Seq((100L, dupText), (101L, dupText), (102L, dupText))
    val sat = runTiny(base, Seq((1L, dupText)), Seq((2L, otherText)),
      "lsh_saturated", cap = Some(2))
    assert(sat.isEmpty, s"saturated bucket leaked pairs: $sat")
    // same data uncapped: the incoming dup matches all three base docs
    val open = runTiny(base, Seq((1L, dupText)), Seq((2L, otherText)),
      "lsh_open")
    assert(open == Set((1L, 100L, 1.0), (1L, 101L, 1.0), (1L, 102L, 1.0)), open)
  }

  test("hotBucketCap + appendIncoming: saturation closes the bucket to LATER stream docs too") {
    // base seeds one member; stream docs 1..2 append (count 2, 3 → the
    // third append saturates: count > cap=2 clears the bucket), so doc 3
    // finds an EMPTY saturated bucket and emits nothing
    val base = Seq((100L, dupText))
    val got = runTiny(base, Seq((1L, dupText), (2L, dupText)),
      Seq((3L, dupText)), "lsh_append_sat",
      appendIncoming = true, cap = Some(2))
    assert(!got.exists(_._1 == 3L), s"doc 3 matched in a saturated bucket: $got")
    // docs 1 and 2 matched against the pre-saturation index
    assert(got.contains((1L, 100L, 1.0)) && got.contains((2L, 100L, 1.0)), got)
  }
}

class StreamIncKnnSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.functions._
  import graft.streaming.AnnStreams

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream candidates rank to the batch x82 answer on the same base/incoming split (sf0.001)") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      import spark.implicits._
      val embs = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val inBase = graft.ext.Sampling.hashThresholdPredicate(
        col("vec_id"), graft.queries.Extensions.BaseFrac)
      val base = embs.filter(inBase)
      val incoming = embs.filter(!inBase)
      val k = graft.queries.Extensions.KnnGraphK
      val batch = graft.ext.Similarity.incrementalKnn(
          base, incoming, "vec_id", "embedding", k = k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      graft.ext.ExtCaches.clearCaches()

      val source = MemoryStream[(Long, Array[Float])]
      val stream = AnnStreams.knnIngestStream(
        source.toDF().toDF("vec_id", "embedding"), base, "vec_id", "embedding")
      val q = stream.writeStream.format("memory").queryName("inc_knn")
        .outputMode("append").start()
      // two micro-batches: the seeded index must carry across them
      val rows = incoming.select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val (h1, h2) = rows.splitAt(rows.length / 2)
      source.addData(h1.toSeq: _*); q.processAllAvailable()
      source.addData(h2.toSeq: _*); q.processAllAvailable()
      q.stop()
      // the registry twin's sink transform: dedup multi-band emissions,
      // rank per incoming vector (valid over the union because a
      // vector's candidates never span batches)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(desc("cosine"), col("base_id"))
      val got = spark.table("inc_knn")
        .dropDuplicates("vec_id", "base_id")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("base_id"),
          r.getAs[Double]("cosine"), r.getAs[Long]("rnk")))
        .toSet
      assert(batch.nonEmpty, "degenerate spec: batch answer is empty")
      assert(got == batch, s"stream=$got batch=$batch")
      graft.ext.ExtCaches.clearCaches()
    }
  }

  test("appendIncoming: a later vector is scored against an earlier STREAM vector") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      import spark.implicits._
      val base = Seq((100L, Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)))
        .toDF("vec_id", "embedding")
      val v = Array.fill(64)(0.5f)
      val source = MemoryStream[(Long, Array[Float])]
      val stream = AnnStreams.knnIngestStream(
        source.toDF().toDF("vec_id", "embedding"), base, "vec_id", "embedding",
        appendIncoming = true)
      val q = stream.writeStream.format("memory").queryName("inc_knn_append")
        .outputMode("append").start()
      source.addData((1L, v)); q.processAllAvailable() // batch 1
      source.addData((2L, v)); q.processAllAvailable() // batch 2: dup of 1
      q.stop()
      val got = spark.table("inc_knn_append").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // vec 2 matches STREAM vec 1 at cosine 1.0 across the batch
      // boundary; the alternating base vector is orthogonal to v and
      // shares no sampled band (all-positive vs alternating signs)
      assert(got.contains((2L, 1L, 1.0)), got)
      graft.ext.ExtCaches.clearCaches()
    }
  }

  test("hotBucketCap: a saturated bucket stops indexing and verifying") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      import spark.implicits._
      // three identical base vectors: every band bucket holds 3 > cap 2
      // members, so all buckets saturate at seed time and the identical
      // incoming vector matches nothing
      val base = Seq(
        (100L, Array.fill(64)(1f)), (101L, Array.fill(64)(1f)),
        (102L, Array.fill(64)(1f))).toDF("vec_id", "embedding")
      val source = MemoryStream[(Long, Array[Float])]
      val stream = AnnStreams.knnIngestStream(
        source.toDF().toDF("vec_id", "embedding"), base, "vec_id", "embedding",
        hotBucketCap = Some(2))
      val q = stream.writeStream.format("memory").queryName("inc_knn_cap")
        .outputMode("append").start()
      source.addData((1L, Array.fill(64)(1f))); q.processAllAvailable()
      q.stop()
      assert(spark.table("inc_knn_cap").isEmpty)
      graft.ext.ExtCaches.clearCaches()
    }
  }
}
