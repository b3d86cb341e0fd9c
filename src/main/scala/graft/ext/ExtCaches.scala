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

  /** Persist `df` and remember it for a later [[clearCaches]]. */
  def persistTracked(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    cached += p
    p
  }

  /** Unpersist every tracked relation (blocking, so storage memory is
    * actually free when this returns — the bench harness relies on that). */
  def clearCaches(): Unit = synchronized {
    cached.foreach(_.unpersist(blocking = true))
    cached.clear()
  }

  /** Number of currently tracked cached relations (for tests). */
  def trackedCount: Int = synchronized(cached.size)
}
