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
  def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }

  /** Free the checkpoint blocks behind `df` (no-op for non-checkpoint
    * plans). Non-blocking: the driver does not wait for block removal. */
  def release(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))
}
