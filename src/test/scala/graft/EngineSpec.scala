package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.{GraftExtensions, GraftFunctions}
import graft.ops.Skew

/** Specs for engine-surface features: SQL function registration and
  * skew-mitigation utilities. */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions are callable from spark.sql text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT dot_product_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot,
        |       simhash(array('spark', 'spark', 'flink'), 32) AS sh,
        |       shingle_array(array('a', 'b', 'c', 'b', 'c'), 2) AS sg,
        |       minhash_signature(array('x', 'y'), 4) AS mh,
        |       winnow_array(array('a', 'b', 'c', 'd', 'e'), 2, 2) AS wn""".stripMargin).first()
    assert(r.getAs[Long]("dot") == 32L)
    assert(r.getAs[Long]("sh") != 0L)
    assert(r.getSeq[String](2) == Seq("a b", "b c", "c b"))
    assert(r.getSeq[String](3).length == 4)
    assert(r.getSeq[String](3).forall(_.matches("[0-9a-f]{32}")))
    assert(r.getSeq[String](4).nonEmpty &&
      r.getSeq[String](4).forall(_.matches("[0-9a-f]{32}")))
  }

  test("SQL functions match their Column-API twins") {
    GraftFunctions.register(spark)
    val df = Seq((Seq("the", "quick", "brown", "fox", "the", "quick"))).toDF("t")
    val viaSql = df.selectExpr("simhash(t, 32)", "shingle_array(t, 3)").first()
    val viaApi = df.select(graft.ext.Dedup.simhash(col("t")),
      graft.ext.TextOps.shingles(col("t"))).first()
    assert(viaSql.getLong(0) == viaApi.getLong(0))
    assert(viaSql.getSeq[String](1) == viaApi.getSeq[String](1))
  }

  test("GraftExtensions exposes the same function set for injection") {
    // the SparkSessionExtensions path is exercised structurally (builders
    // run and produce expressions); full injection needs a fresh session,
    // which local test JVMs share
    assert(GraftFunctions.descriptions.map(_._1.funcName).sorted ==
      Seq("dot_product_long", "heavy_hitters", "minhash_signature",
        "shingle_array", "simhash", "winnow_array"))
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // must not throw
  }

  test("saltedSumCount equals the direct aggregation") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong, i))
      .toDF("key", "v", "id")
    val direct = df.groupBy("key")
      .agg(sum("v").as("sum_value"), count(lit(1)).as("n_rows"))
    val salted = Skew.saltedSumCount(df, Seq("key"), col("v"), Seq("id"), buckets = 8)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("salted aggregation spreads a hot key across buckets in phase 1") {
    val df = (1 to 100).map(i => ("hot", 1L, i)).toDF("key", "v", "id")
    val phase1Groups = df
      .groupBy(col("key"), pmod(hash(col("id")), lit(8)).as("_salt"))
      .count().count()
    assert(phase1Groups > 1) // the single hot key occupies multiple reducers
  }
}
