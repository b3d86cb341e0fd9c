package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.queries.{Chinook, Extensions}

/** Physical-plan assertions (SURVEY.md §4): the plans the engine is
  * designed around must actually materialize — filters reach the parquet
  * scan, dimension joins broadcast, rank-filters become WindowGroupLimit,
  * global top-k becomes TakeOrderedAndProject, and scans are
  * column-pruned. Run against the sf0.001 testdata (read-only). */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q02: country filter is pushed down to the nation parquet scan") {
    val p = formatted(Chinook.q02_top_parts_usa(spark, dir))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(n_name,NATION_0)"), p)
  }

  test("q02: small-dimension joins plan as BroadcastHashJoin") {
    val p = formatted(Chinook.q02_top_parts_usa(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q05: dense_rank <= k filter plans as WindowGroupLimit") {
    val p = formatted(Chinook.q05_top_cust_per_country(spark, dir))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q02: orderBy().limit() plans as TakeOrderedAndProject (no global sort)") {
    val p = formatted(Chinook.q02_top_parts_usa(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q04: orders scan is column-pruned to the referenced columns") {
    val p = formatted(Chinook.q04_rev_by_geo(spark, dir))
    val scanLine = p.linesIterator.find(l =>
      l.contains("ReadSchema") && l.contains("o_custkey")).getOrElse("")
    assert(scanLine.contains("o_totalprice") && !scanLine.contains("o_orderpriority"),
      s"orders ReadSchema not pruned: $scanLine\n$p")
  }

  test("x06: custom dot-product expression is planned, with codegen stages") {
    val p = formatted(Extensions.x06_sim_topk_brute(spark, dir))
    assert(p.contains("dot_product_long"), p)
    // formatted mode tags codegen'd operators with "[codegen id : N]"
    assert(p.contains("[codegen id :"), p)
  }

  test("q12: recency anchor is a broadcast join, not a driver collect") {
    val p = formatted(Chinook.q12_inactive(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("x03: LSH candidate join is an equi-join (hash/merge), not a product") {
    val p = formatted(graft.ext.Dedup.minhashLshPairs(
      graft.tables.Tables.documents(spark, dir), "doc_id", "text"))
    assert(!p.contains("CartesianProduct"), p)
  }
}
