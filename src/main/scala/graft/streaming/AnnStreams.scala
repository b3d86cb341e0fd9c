package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.ext.Similarity

/** Streaming incremental ANN ingest — the batch
  * [[Similarity.incrementalKnn]] with the sampled-band index as
  * STREAMING STATE: `transformWithState` ListState keyed by the band
  * key, seeded from the base corpus via the initial-state API, and
  * every incoming vector scored IN-STREAM against its band-mates — the
  * online-index-build form (embed → ingest → neighbor lookup at arrival
  * time) a production vector pipeline runs, where the batch form waits
  * for a snapshot. The ANN twin of [[DedupStreams]], same pattern
  * throughout.
  *
  * Semantics are the batch operator's by construction: band keys come
  * from the SAME [[Similarity.sampledBandKeysOf]] expression (one
  * spelling), and the per-candidate score is exact-integer dot + two
  * sqrt's + one divide — operand-for-operand the
  * [[Similarity.cosineFromParts]] tree, so the doubles are
  * bit-identical and the registry twin hash-gates against the batch
  * oracle verbatim. The processor emits SCORES; the per-query top-k
  * rank runs in the sink per micro-batch, which is exact because all of
  * an incoming vector's band rows ride in its own micro-batch (the x55
  * argument: candidates for one vector can never span batches when only
  * the BASE side is indexed).
  *
  * State is bounded by the same two knobs as the LSH twin:
  * `hotBucketCap` saturates a bucket past the cap (members cleared, a
  * monotone non-expiring count keeps it closed — the batch guard's
  * streaming rendition, spec-pinned), and `stateTtl` puts a native TTL
  * on members for the recrawl-horizon regime (processing-time mode).
  * Per-key state is ≤ cap vectors of d int64s; per-row verify is
  * O(bucket) exact dots — the probe cost the batch plan pays as its
  * band equi-join. */
object AnnStreams {
  /** One (bandKey, vector) row; `v` is the quantized vector. */
  case class BandVec(bkey: Long, id: Long, v: Seq[Long], norm: Long)
  /** A member of a bucket's in-state index. */
  case class VecIndexed(id: Long, v: Seq[Long], norm: Long)
  /** One bucket's initial index, aggregated to one row per key. */
  case class BucketVecInit(docs: Seq[VecIndexed])
  /** One scored candidate (pre-rank; the sink ranks per vec_id). */
  case class KnnCand(vec_id: Long, base_id: Long, cosine: Double)

  /** (bandKey, id, quantized vector, norm) rows for a batch OR streaming
    * relation — ONE typed flatMap per row, O(d + bands·bits) JVM work.
    *
    * Why not the [[Similarity]] column expressions: on a STREAM there is
    * no persist barrier, so Catalyst's project collapse inlines
    * `quantize` into every one of the bands·bits sign-gather terms
    * (256 × 64-element array transforms per row at the 16×16 geometry —
    * measured at ~25× the whole twin's runtime before this rewrite; the
    * batch operators dodge it because `withNorm` persists the quantized
    * relation first). The JVM arithmetic is bit-matched to the
    * expression spelling term for term: float→double widening is exact,
    * ×2^20 is an exponent shift, rounding replicates HALF-AWAY-FROM-ZERO
    * (what both Spark's `round` and DuckDB's compute), the signature
    * bit d is v(d) ≥ 0, and band bit i reads signature bit
    * `sampledCoords(j)(i)` — the same shared coordinate table. The
    * stream-equals-batch oracle gate (x82_stream vs the batch SQL) is
    * what holds this equivalence to hash precision. */
  def bandVecs(df: DataFrame, idCol: String, vecCol: String, bands: Int,
               bitsPerBand: Int, dims: Int, seed: Long): Dataset[BandVec] = {
    import df.sparkSession.implicits._
    val coords = Similarity.sampledCoords(bands, bitsPerBand, dims, seed)
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, vec) =>
        val v = new Array[Long](vec.length)
        var i = 0
        while (i < vec.length) {
          val d = vec(i).toDouble * Similarity.Scale
          // HALF_UP (away from zero) — Spark round/DuckDB round; the
          // +0.5 is exact for |d| < 2^52
          v(i) = (if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)).toLong
          i += 1
        }
        var norm = 0L
        i = 0
        while (i < v.length) { norm += v(i) * v(i); i += 1 }
        var sig = 0L
        i = 0
        val nd = math.min(dims, v.length)
        while (i < nd) { if (v(i) >= 0L) sig |= 1L << i; i += 1 }
        // a vector shorter than dims contributes 0 bits past its end
        // only if those coordinates read as negative — element_at on a
        // missing index is null, and the expression's `>= 0L` on null is
        // false, so missing coordinates are 0 bits: sig bits past
        // v.length stay 0, matching.
        val vs = v.toSeq
        (0 until bands).map { j =>
          var key = j.toLong << bitsPerBand
          var b = 0
          while (b < bitsPerBand) {
            if ((sig & (1L << coords(j)(b))) != 0L) key |= 1L << b
            b += 1
          }
          BandVec(key, id, vs, norm)
        }
      }
  }

  /** Per-bucket stateful processor: state = the bucket's member vectors
    * (ListState, TTL-able) + a monotone member count (ValueState)
    * driving hot-bucket saturation. Emits one scored candidate per
    * (incoming row, member); a pair colliding in several bands emits
    * identical values once per collision — the sink canonicalizes with
    * dropDuplicates, mirroring the batch candidates' `.distinct()`.
    * Input rows are drained eagerly and the output returned as a
    * materialized list's iterator (state mutation must not depend on
    * downstream consumption). */
  class KnnBucketProcessor(appendIncoming: Boolean,
                           hotBucketCap: Option[Int] = None,
                           memberTtl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessorWithInitialState[Long, BandVec, KnnCand, BucketVecInit] {
    @transient private var members: ListState[VecIndexed] = _
    @transient private var nMembers: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getListState[VecIndexed]("members",
        Encoders.product[VecIndexed], memberTtl)
      // saturation must outlive member TTL (see DedupStreams)
      nMembers = getHandle.getValueState[Long]("nMembers",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def count: Long = if (nMembers.exists()) nMembers.get() else 0L
    private def saturated: Boolean = hotBucketCap.exists(count > _)

    override def handleInitialState(key: Long, initialState: BucketVecInit,
                                    timerValues: TimerValues): Unit = {
      nMembers.update(count + initialState.docs.size)
      if (saturated) members.clear()
      else initialState.docs.foreach(members.appendValue)
    }

    override def handleInputRows(key: Long, rows: Iterator[BandVec],
                                 timerValues: TimerValues): Iterator[KnnCand] = {
      val out = List.newBuilder[KnnCand]
      rows.foreach { r =>
        if (!saturated) {
          members.get().foreach { m =>
            // exact int64 dot, then long→double casts + sqrt·sqrt + one
            // divide — the cosineFromParts tree operand for operand
            var dot = 0L
            var i = 0
            val n = math.min(r.v.length, m.v.length)
            while (i < n) { dot += r.v(i) * m.v(i); i += 1 }
            out += KnnCand(r.id, m.id,
              dot.toDouble / (math.sqrt(r.norm.toDouble) * math.sqrt(m.norm.toDouble)))
          }
          if (appendIncoming) {
            nMembers.update(count + 1)
            if (saturated) members.clear()
            else members.appendValue(VecIndexed(r.id, r.v, r.norm))
          }
        }
      }
      out.result().iterator
    }
  }

  /** The streaming operator: `incoming` is an unbounded vector stream,
    * `base` the bounded corpus whose band index seeds the state.
    * Returns the scored-candidate stream (append mode); the caller's
    * sink dedups multi-band emissions and ranks top-k per vec_id per
    * micro-batch. `stateTtl` switches to processing-time mode (see
    * [[DedupStreams.lshDedupStream]] for the trigger caveat). */
  def knnIngestStream(incoming: DataFrame, base: DataFrame, idCol: String,
                      vecCol: String, bands: Int = 16, bitsPerBand: Int = 16,
                      dims: Int = 64, seed: Long = 0x5EEDL,
                      appendIncoming: Boolean = false,
                      hotBucketCap: Option[Int] = None,
                      stateTtl: Option[java.time.Duration] = None): Dataset[KnnCand] = {
    import incoming.sparkSession.implicits._
    val init: KeyValueGroupedDataset[Long, BucketVecInit] =
      bandVecs(base, idCol, vecCol, bands, bitsPerBand, dims, seed)
        .groupByKey(_.bkey)
        .mapGroups((k, it) =>
          (k, BucketVecInit(it.map(b => VecIndexed(b.id, b.v, b.norm)).toSeq)))
        .groupByKey(_._1)
        .mapValues(_._2)
    val timeMode =
      if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    val ttl = stateTtl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    bandVecs(incoming, idCol, vecCol, bands, bitsPerBand, dims, seed)
      .groupByKey(_.bkey)
      .transformWithState(
        new KnnBucketProcessor(appendIncoming, hotBucketCap, ttl),
        timeMode, OutputMode.Append(), init)
  }
}
