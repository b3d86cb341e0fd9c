package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues}

import graft.ext.{Dedup, TextOps}

/** Streaming incremental near-dup dedup — the batch x55
  * ([[Dedup.incrementalLshPairs]]) composed with x65's stateful-stream
  * machinery (the round-8 verdict's stretch item): the LSH band index
  * lives as STREAMING STATE (`transformWithState` ListState keyed by the
  * band bucket), seeded from the ingested base corpus via the
  * initial-state API, and every incoming document is checked against it
  * IN-STREAM — the production nightly-crawl form, where the crawl lands
  * continuously and the dedup gate cannot wait for a batch boundary.
  *
  * Semantics are the batch operator's, by construction: the same
  * shingle/signature/banding expressions build the band rows (one
  * spelling — [[bandDocs]] is shared code, not a parallel
  * reimplementation), a candidate is a band-bucket collision, and every
  * candidate is verified with the same exact distinct-shingle Jaccard
  * (one IEEE divide of exact integers — bit-identical to the batch
  * column expression). StreamIncLshSpec proves stream output == the
  * batch x55 answer on the same base/incoming split.
  *
  * Scale shape: state is exactly the stored artifact the batch pipeline
  * maintains offline — per (band, bucket): member ids + their shingle
  * sets. Keys partition across executors (state store sharding), each
  * incoming doc touches `bands` buckets, and cost tracks collisions,
  * never |stream|·|base|. `appendIncoming` is the index-maintenance
  * knob: when on, accepted documents join the in-state index and later
  * stream docs dedup against them too (WITHIN-stream near-dup across
  * micro-batch boundaries — the half x55's batch-vs-base form does not
  * cover; spec-pinned). A production deployment bounds state with the
  * same hot-bucket cap the batch side uses (drop or TTL buckets past
  * the cap — the LSH collision guard, not a correctness knob) and
  * stores shingle sets out-of-state past a size threshold. */
object DedupStreams {
  /** One (bucketKey, doc) band row; `sh` is the DISTINCT shingle set. */
  case class BandDoc(bkey: String, id: Long, sh: Seq[String])
  /** A member of a bucket's in-state index. */
  case class IndexedDoc(id: Long, sh: Seq[String])
  /** One bucket's initial index — aggregated to ONE initial-state row
    * per key so seeding cannot depend on how the runtime groups
    * initial-state rows. */
  case class BucketInit(docs: Seq[IndexedDoc])
  /** A verified near-dup match (jaccard ≥ threshold). */
  case class LshMatch(doc_id: Long, base_id: Long, jaccard: Double)

  /** (bucketKey, id, shingles) band rows for a batch OR streaming doc
    * relation — the x55 signature/banding pipeline as one shared
    * spelling (per-row projections only, so it runs unchanged on a
    * stream). bkey = "band|md5(band slice of the minhash signature)". */
  def bandDocs(docs: DataFrame, idCol: String, textCol: String,
               w: Int, perms: Int, bands: Int): Dataset[BandDoc] = {
    import docs.sparkSession.implicits._
    val rows = perms / bands
    docs.select(col(idCol).as("id"),
        TextOps.shingles(TextOps.tokens(col(textCol)), w).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), perms))
      .select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          j => md5(concat_ws(",", slice(col("sig"), j * rows + 1, lit(rows)))))))
      .select(concat_ws("|", col("pos"), col("col")).as("bkey"),
        col("id"), col("sh"))
      .as[BandDoc]
  }

  /** Per-bucket stateful processor: state = the bucket's member index
    * (ListState), seeded from the base corpus; each incoming band row is
    * verified against every member with exact distinct-shingle Jaccard.
    * A true pair colliding in several bands emits once per collision
    * with IDENTICAL values — callers canonicalize with
    * dropDuplicates(doc_id, base_id), mirroring the batch candidates'
    * `.distinct()`. */
  class LshBucketProcessor(threshold: Double, appendIncoming: Boolean)
      extends StatefulProcessorWithInitialState[String, BandDoc, LshMatch, BucketInit] {
    @transient private var members: ListState[IndexedDoc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[IndexedDoc]("members",
        Encoders.product[IndexedDoc], TTLConfig.NONE)

    override def handleInitialState(key: String, initialState: BucketInit,
                                    timerValues: TimerValues): Unit =
      initialState.docs.foreach(members.appendValue)

    override def handleInputRows(key: String, rows: Iterator[BandDoc],
                                 timerValues: TimerValues): Iterator[LshMatch] =
      rows.flatMap { r =>
        val shA = r.sh.toSet
        // |A ∩ B| over DISTINCT shingles, then one IEEE divide of exact
        // ints — operand-for-operand the batch verify expression.
        val out = members.get().flatMap { m =>
          val common = m.sh.count(shA)
          val j = common.toDouble / (r.sh.size + m.sh.size - common)
          if (j >= threshold) Some(LshMatch(r.id, m.id, j)) else None
        }.toList
        if (appendIncoming) members.appendValue(IndexedDoc(r.id, r.sh))
        out.iterator
      }
  }

  /** The streaming operator: `incoming` is an unbounded doc stream,
    * `base` the bounded ingested corpus whose band index seeds the
    * state. Returns the verified match stream (append mode); callers
    * dedup multi-band emissions with dropDuplicates(doc_id, base_id)
    * (production: dropDuplicatesWithinWatermark keyed on ingest time, so
    * that state is bounded by the redelivery horizon — the x65 knob). */
  def lshDedupStream(incoming: DataFrame, base: DataFrame, idCol: String,
                     textCol: String, w: Int = 3, perms: Int = 16,
                     bands: Int = 4, threshold: Double = 0.5,
                     appendIncoming: Boolean = false): Dataset[LshMatch] = {
    import incoming.sparkSession.implicits._
    val init: KeyValueGroupedDataset[String, BucketInit] =
      bandDocs(base, idCol, textCol, w, perms, bands)
        .groupByKey(_.bkey)
        .mapGroups((k, it) =>
          (k, BucketInit(it.map(b => IndexedDoc(b.id, b.sh)).toSeq)))
        .groupByKey(_._1)
        .mapValues(_._2)
    bandDocs(incoming, idCol, textCol, w, perms, bands)
      .groupByKey(_.bkey)
      .transformWithState(new LshBucketProcessor(threshold, appendIncoming),
        TimeMode.None(), OutputMode.Append(), init)
  }
}
