package graft

import org.apache.spark.sql.functions._
import graft.ops.Approx
import graft.tables.Typed

/** Specs for the typed Dataset surface and approximate aggregations. */
class TypedApproxSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("typed loaders validate schema and support typed transforms") {
    import spark.implicits._
    val orders = Typed.orders(spark, dir)
    val first = orders.filter(_.o_totalprice > 0).head()
    assert(first.o_orderkey >= 0 && first.o_orderdate != null)
    // typed semantics survive into aggregation
    val spend = orders.groupByKey(_.o_custkey)
      .mapGroups((k, os) => (k, os.map(_.o_totalprice).sum))
    assert(spend.count() > 0)
  }

  test("typed documents join the untyped pipeline cleanly") {
    val docs = Typed.documents(spark, dir)
    assert(docs.filter(_.n_chars > 0).count() == docs.count())
  }

  test("approx distinct count lands within the configured error bound") {
    val audit = Approx.distinctCountAudit(
      graft.tables.Tables.lineitem(spark, dir), Seq(), "l_partkey", rsd = 0.05)
    val rel = audit.select("rel_err").head().getDouble(0)
    assert(rel < 0.15, s"relative error $rel out of bound") // 3x rsd margin
  }

  test("approx percentile tracks the exact percentile") {
    val li = graft.tables.Tables.lineitem(spark, dir)
    val r = li.agg(
      expr("percentile(l_quantity, 0.5D)").as("exact"),
      Approx.percentileApprox(col("l_quantity"), 0.5).as("approx")).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1.0)
  }
}
