package graft.ext

import org.apache.spark.sql.DataFrame

/** Registry for relations the extension operators persist() as join-reuse
  * barriers (shingle indexes, minhash band rows, quantized embedding
  * tables, corpus statistics). Each operator registers what it caches;
  * a long-lived session (or the bench harness between query families)
  * calls [[clearCaches]] to release executor storage memory. Mirrors
  * `graft.queries.Chinook.clearCaches` for the reference-workload caches.
  */
object ExtCaches {
  private val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val clearHooks = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Persist `df` and remember it for a later [[clearCaches]]. */
  def persistTracked(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    cached += p
    fills += 1
    p
  }

  private var fills = 0L

  /** Monotone count of [[persistTracked]] calls since JVM start — never
    * reset by [[clearCaches]]. The bench harness reads the delta across a
    * query's reps to attribute time to cache-relation builds: a rep that
    * fills N relations is paying N materializations, and a query whose
    * official-record time inflated without a matching fill delta was slowed
    * by something OUTSIDE the operator (GC, co-tenant load) — the round-8
    * verdict's unattributed-tail gap this telemetry closes. */
  def fillCount: Long = synchronized(fills)

  /** [[persistTracked]] + an EAGER fill. For a persisted relation whose
    * SELF-JOIN dominates the operator: a lazily-cached relation is
    * filled during the join itself, and the join's two scans race —
    * concurrent tasks computing the same un-filled cache partition each
    * recompute it (the block store dedupes finished blocks, not
    * in-flight work). Round-7 soak: the df-capped shingle index (whose
    * only structural difference at cap ≥ max df is its eager fill) ran
    * 1.4x faster than the lazy uncapped twin at x30; adopting eager for
    * x02/x52/x38 reproduced the win (x02 13.6 → 9.7 s at x30).
    *
    * NOT a default: where the operator's cost lives in stages around
    * the join (x51's rarity window + verify tail, x03/x55's signature
    * build), eager fills SERIALIZE the big materializations ahead of
    * the join instead of overlapping with it and measured 2-4x SLOWER
    * at the largest soak scale (tools/DiagX51) — those operators keep
    * lazy persists, with the measurements at each call site. The
    * count() is outside the `synchronized` — it runs a Spark job and
    * must not hold the registry lock. */
  def persistEager(df: DataFrame): DataFrame = {
    val p = persistTracked(df)
    p.count()
    p
  }

  /** Unpersist ONE tracked relation early (blocking) and drop it from the
    * registry — for staging relations whose useful life ends as soon as a
    * derived persist materializes (e.g. winnowPairs' raw fingerprint
    * relation once the df-capped index is built): holding both doubles
    * the cached footprint of the pipeline's largest relation for the
    * whole session segment. */
  def releaseTracked(df: DataFrame): Unit = synchronized {
    val i = cached.indexWhere(_ eq df)
    if (i >= 0) {
      cached.remove(i)
      df.unpersist(blocking = true)
    }
  }

  /** Eager localCheckpoint with its blocks tracked for release at
    * [[clearCaches]] — the Similarity-trainer lineage discipline
    * (Similarity.cpTracked's hazard note applies verbatim) exposed for
    * the OTHER iterative trainers. Round 16, measured: the BPE merge
    * loops chained lazy persists, and because every round references
    * the previous round TWICE (pair statistic + fold input), the
    * analyzed plan grows 2^k — Catalyst re-renders the cached subtree
    * per reference, and at k = 6 (x110c) the formatted plan was 940 KB
    * with driver-side planning dominating the query (11.8 s vs the
    * 4-round char twin's 1.7 s). Rooting each round at a LogicalRDD
    * keeps the plan O(1) per round.
    *
    * HOLD-ACROSS-clearCaches HAZARD (same as cpTracked): once
    * clearCaches releases the blocks, a held derivative CANNOT
    * recompute — it fails loudly with a missing-block error. Every
    * registry query constructs, runs, and dumps its result before any
    * clearCaches, which is the intended contract. Counted in
    * [[fillCount]] like every other tracked materialization so the
    * bench's cf attribution column sees checkpoint fills too. */
  def checkpointTracked(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    synchronized { fills += 1 }
    trackReleasable(() =>
      org.apache.spark.sql.graftfn.Lineage.release(cp, blocking = true))
    cp
  }

  private val releasables = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Track a release action for storage that is NOT a persisted DataFrame
    * (localCheckpoint block sets, etc.). Run and dropped by every
    * [[clearCaches]] — keeps the "storage is actually free when
    * clearCaches returns" contract for the checkpoint-based operators. */
  def trackReleasable(release: () => Unit): Unit = synchronized {
    releasables += release
  }

  /** Register a callback run by every [[clearCaches]] — for KEYED caches
    * holding references to tracked relations (e.g. the component-label
    * registry), which must drop their entries when the persists beneath
    * them are released: a kept reference would silently re-evaluate the
    * un-persisted lineage on next use. */
  def registerClearHook(h: () => Unit): Unit = synchronized {
    clearHooks += h
  }

  /** Unpersist every tracked relation (blocking, so storage memory is
    * actually free when this returns — the bench harness relies on that),
    * then run the registered keyed-cache hooks. */
  def clearCaches(): Unit = synchronized {
    cached.foreach(_.unpersist(blocking = true))
    cached.clear()
    releasables.foreach(_.apply())
    releasables.clear()
    clearHooks.foreach(_.apply())
  }

  /** Number of currently tracked cached relations (for tests). */
  def trackedCount: Int = synchronized(cached.size)
}
