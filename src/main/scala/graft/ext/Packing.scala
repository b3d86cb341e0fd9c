package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: lay documents end-to-end into fixed-size training
  * context windows ("packs") and emit the placement manifest — the step
  * between a cleaned corpus and a pretraining data loader. This is the
  * concat-and-chunk discipline (documents are concatenated in a
  * deterministic order and the token stream is cut every `ctxLen`
  * tokens, so a document may straddle a pack boundary); the manifest
  * records, per document, exactly where its tokens land, which is what
  * a loader needs to materialize any pack independently.
  *
  * Scale shape: packing is inherently sequential WITHIN a token stream
  * (each placement depends on the running total), so the parallel unit
  * is the shard — documents are hash-assigned to `16^shardHexChars`
  * independent streams, each packed by a cumulative-sum window over
  * that shard alone. One shuffle (hash partition by shard), bounded
  * per-partition state (a running sum), no global sort. At 100 TB the
  * shard count keys off the cluster (e.g. 4 hex chars = 65,536 streams
  * of ~1.5 GB each); here 16 shards at local scale. Determinism: the
  * shard function is a hash, the within-shard order is the unique
  * doc id, so the manifest is re-run-stable — a re-pack after a corpus
  * append only grows each stream's tail.
  *
  * The shard key is the first `shardHexChars` hex chars of md5(id) —
  * the same engine-portable hash family as [[Sampling]] (the DuckDB
  * oracle computes the identical key), kept as a STRING: it is a
  * partition label, never arithmetic.
  */
object Packing {
  /** Per-document placement manifest for `ctxLen`-token packs.
    *
    * Output columns (one row per document with ≥1 token):
    *  - `shard` — the document's stream label;
    *  - `n_tokens`;
    *  - `start_offset` — global token offset within the shard's stream;
    *  - `pack_first` — index of the pack its first token lands in;
    *  - `offset_in_pack` — position of that first token inside the pack;
    *  - `packs_spanned` — how many packs the document touches (>1 ⇔ it
    *    straddles at least one boundary).
    */
  def packManifest(df: DataFrame, idCol: String, tokenCountCol: Column,
                   ctxLen: Long, shardHexChars: Int = 1): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    require(shardHexChars >= 1 && shardHexChars <= 8,
      s"shardHexChars must be in [1,8], got $shardHexChars")
    val id = col(idCol)
    val shard = substring(md5(id.cast("string")), 1, shardHexChars)
    val byShard = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(id.as("id"), shard.as("shard"),
        tokenCountCol.cast(LongType).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("cum_end", sum(col("n_tokens")).over(byShard))
      .withColumn("start_offset", col("cum_end") - col("n_tokens"))
      // `div` = exact integer division on longs (a double round-trip is
      // only exact below 2^53 — a real shard stream stays under that,
      // but the manifest should not depend on it)
      .select(
        col("id").as(idCol), col("shard"), col("n_tokens"),
        col("start_offset"),
        expr(s"start_offset div $ctxLen").as("pack_first"),
        pmod(col("start_offset"), lit(ctxLen)).as("offset_in_pack"),
        (expr(s"(cum_end - 1) div $ctxLen")
          - expr(s"start_offset div $ctxLen") + 1L)
          .as("packs_spanned"))
  }

  /** Shard-level packing summary over a [[packManifest]] result: stream
    * length, pack count, and the tail remainder a loader pads (every
    * non-final pack is exactly full by construction — concat-and-chunk
    * has no internal padding). One map-side-combinable aggregate. */
  def packSummary(manifest: DataFrame, ctxLen: Long): DataFrame =
    manifest
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("stream_tokens"))
      .select(col("shard"), col("n_docs"), col("stream_tokens"),
        (expr(s"(stream_tokens - 1) div $ctxLen") + 1L).as("n_packs"),
        pmod(col("stream_tokens"), lit(ctxLen)).as("tail_tokens"))
}
