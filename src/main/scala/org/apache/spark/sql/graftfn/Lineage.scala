package org.apache.spark.sql.graftfn

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Access to the materialized RDD behind a `localCheckpoint`ed Dataset
  * (its analyzed plan is a single [[LogicalRDD]] over the checkpoint
  * blocks). The iterative operators (connected components) end every
  * round in an eager local checkpoint to keep lineage O(1); this hook
  * lets them release superseded rounds' storage DETERMINISTICALLY —
  * waiting for the ContextCleaner to notice unreferenced RDDs would
  * leave checkpoint blocks occupying executor storage while later bench
  * queries are being timed.
  *
  * CAUTION for callers: unlike a plain persist, a local checkpoint's
  * blocks ARE the data (lineage is truncated) — release only when no
  * derived plan will execute again.
  */
object Lineage {
  /** The checkpoint RDD — ONLY when `df` IS the checkpoint Dataset (its
    * analyzed plan is the LogicalRDD root). A derived plan (projection,
    * join) over a checkpoint deliberately returns None: releasing blocks
    * through a derived reference would silently destroy data still
    * shared with sibling DataFrames (truncated lineage cannot
    * recompute). */
  def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _             => None
    }

  /** Free the checkpoint blocks behind `df` (no-op for anything but a
    * checkpoint Dataset itself). `blocking = true` is for release paths
    * with a storage-is-free-on-return contract (ExtCaches.clearCaches);
    * mid-iteration releases stay async. */
  def release(df: DataFrame, blocking: Boolean = false): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking))
}
