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
    p
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
    clearHooks.foreach(_.apply())
  }

  /** Number of currently tracked cached relations (for tests). */
  def trackedCount: Int = synchronized(cached.size)
}
