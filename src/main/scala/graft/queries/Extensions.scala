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
  /** The full gated registry — the union of every family's slice. Key
    * uniqueness across slices is spec-guarded (RegistrySpec). */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    queriesDedup ++ queriesQuality ++ queriesAnn ++ queriesGraph ++
      queriesRetrieval ++ queriesStream ++ queriesEngineOps

  /** DuckDB oracle twins, unioned the same way. */
  val oracleSql: Map[String, String] =
    oracleSqlDedup ++ oracleSqlQuality ++ oracleSqlAnn ++ oracleSqlGraph ++
      oracleSqlRetrieval ++ oracleSqlStream ++ oracleSqlEngineOps
}
