package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star extension queries (SURVEY.md §7.6): the LLM-data-pipeline
  * operators over the documents / embeddings / events tables, each with a
  * DuckDB oracle twin where ANSI-SQL-expressible. Streaming-only behavior
  * (watermarks, incremental state) has no oracle and is covered by
  * MemoryStream specs instead (graft.StreamingSpec).
  *
  * Shared engine-wide conventions that make Spark and DuckDB bit-agree:
  * md5 lowercase-hex for all content hashing, exact decimal accumulation
  * for float sums, integer arithmetic until one final IEEE double divide,
  * and a deterministic total ORDER BY on every result.
  */
object Extensions extends ExtCore {
  /** Per-family registry slices, named — exposed so RegistrySpec can
    * assert the union below lost nothing to a cross-family key clash
    * (Map ++ silently shadows; the doc-count gate would catch it only
    * indirectly). */
  val querySlices: Seq[(String, Map[String, (SparkSession, String) => DataFrame])] =
    Seq("dedup" -> queriesDedup, "quality" -> queriesQuality,
      "ann" -> queriesAnn, "graph" -> queriesGraph,
      "retrieval" -> queriesRetrieval, "stream" -> queriesStream,
      "engineOps" -> queriesEngineOps)

  /** The full gated registry — the union of every family's slice. Key
    * uniqueness across slices is spec-guarded (RegistrySpec pins
    * Σ slice sizes = union size via [[querySlices]]/[[oracleSlices]]). */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    querySlices.map(_._2).reduce(_ ++ _)

  /** Oracle slices, same keys as [[querySlices]]. */
  val oracleSlices: Seq[(String, Map[String, String])] =
    Seq("dedup" -> oracleSqlDedup, "quality" -> oracleSqlQuality,
      "ann" -> oracleSqlAnn, "graph" -> oracleSqlGraph,
      "retrieval" -> oracleSqlRetrieval, "stream" -> oracleSqlStream,
      "engineOps" -> oracleSqlEngineOps)

  /** DuckDB oracle twins, unioned the same way. */
  val oracleSql: Map[String, String] = oracleSlices.map(_._2).reduce(_ ++ _)
}
