package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application — the consumer half of the x37 diff
  * (Extensions.x37_snapshot_cdc emits the MERGE feed; this applies it).
  * `apply(v1, cdc) == v2` is the round-trip a MERGE INTO sink assumes and
  * the property the x58 oracle gate proves cross-engine: the Spark side
  * reconstructs v2 from v1 + the change set, the DuckDB oracle computes
  * v2 directly, and the hash compare certifies the diff is SUFFICIENT
  * (not merely correct row-by-row).
  *
  * Scale shape: ONE equi-join on the key. The change set is |changed
  * keys| — typically a small fraction of the snapshot, so Spark
  * broadcasts it and the apply is a scan over v1 plus the insert rows;
  * when the change set is table-sized the join degrades gracefully to a
  * co-partitioned sort-merge join, and with key-bucketed layouts
  * (Sources.writeBucketed) the shuffle disappears. MERGE semantics:
  * delete drops the key, insert adds it, update replaces the value,
  * absent-from-cdc passes through — exactly MERGE INTO ... WHEN MATCHED
  * [AND ...] THEN UPDATE/DELETE, WHEN NOT MATCHED THEN INSERT. */
object Cdc {
  /** Apply a change set to a base snapshot. `changes` must carry the key,
    * a `change_type` in {insert, update, delete}, and `newValCol` (the
    * post-change value; ignored for deletes). Returns (key, valCol). */
  def applyChanges(base: DataFrame, changes: DataFrame,
                   keyCol: String, valCol: String,
                   newValCol: String): DataFrame = {
    val ch = changes.select(col(keyCol), col("change_type"),
      col(newValCol).as("__new_value"))
    base.join(ch, Seq(keyCol), "full_outer")
      .filter(col("change_type").isNull || col("change_type") =!= "delete")
      .select(col(keyCol), coalesce(col("__new_value"), col(valCol)).as(valCol))
  }
}
