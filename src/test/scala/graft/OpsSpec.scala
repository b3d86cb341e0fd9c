package graft

import org.apache.spark.sql.functions._
import graft.ops.{Exact, PairMining, Quality, TopK}

/** Specs for the core operator families (SURVEY.md §2): quality probes,
  * top-k idioms, pair mining, exact aggregation. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("duplicates finds only keys with count > 1") {
    val df = Seq(1, 2, 2, 3, 3, 3).toDF("k")
    val dup = Quality.duplicates(df, Seq("k")).orderBy("k").collect()
    assert(dup.map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((2, 2L), (3, 3L)))
  }

  test("anyNullCount counts rows with any audited column null") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None))
      .toDF("x", "y")
    assert(Quality.anyNullCount(df, Seq("x", "y")).first().getLong(0) == 2L)
  }

  test("nullAudit reports per-column null counts in one pass") {
    val df = Seq((Some(1), None: Option[String]), (None, Some("b"))).toDF("x", "y")
    val r = Quality.nullAudit(df, Seq("x", "y")).first()
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
  }

  test("cleanse applies the docx Q1 policy: numeric→0, categorical→Unknown") {
    val df = Seq((Some(1), Some("a")), (None, None)).toDF("n", "c")
    val r = Quality.cleanse(df, Seq("n"), Seq("c")).orderBy("n").collect()
    assert(r.map(x => (x.getInt(0), x.getString(1))).toSeq ==
      Seq((0, "Unknown"), (1, "a")))
  }
}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val sales = Seq(
    ("us", "a", 10.0), ("us", "b", 20.0), ("us", "c", 20.0), ("us", "d", 5.0),
    ("de", "e", 7.0), ("de", "f", 3.0)).toDF("grp", "id", "v")

  test("perGroupDense keeps ties and ranks without gaps") {
    val r = TopK.perGroupDense(sales, Seq(col("grp")),
        Seq(desc("v"), col("id")), 2)
      .orderBy("grp", "rnk", "id").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(3)))
    // dense_rank with tiebreak id: b=1, c=2, a=3 → top2 keeps b,c per us
    assert(r.toSeq == Seq(("de", "e", 1L), ("de", "f", 2L),
      ("us", "b", 1L), ("us", "c", 2L)))
  }

  test("perGroupFirst returns exactly one deterministic row per group") {
    val r = TopK.perGroupFirst(sales, Seq(col("grp")), Seq(desc("v"), col("id")))
      .orderBy("grp").collect().map(x => (x.getString(0), x.getString(1)))
    assert(r.toSeq == Seq(("de", "e"), ("us", "b")))
  }

  test("globalTopK equals rank-then-filter under a total order") {
    val r = TopK.globalTopK(sales, Seq(desc("v"), col("id")), 3)
      .orderBy("rnk").collect().map(x => (x.getString(1), x.getLong(3)))
    assert(r.toSeq == Seq(("b", 1L), ("c", 2L), ("a", 3L)))
  }
}

class PairMiningSpec extends SparkSpec {
  import spark.implicits._

  test("coOccurrence counts each unordered cross-label line pair once") {
    // basket 1: rock, rock, metal → pairs: (metal,rock) ×2
    // basket 2: jazz, rock       → pairs: (jazz,rock) ×1
    val lines = Seq(
      (1L, 1, "rock"), (1L, 2, "rock"), (1L, 3, "metal"),
      (2L, 1, "jazz"), (2L, 2, "rock")).toDF("bk", "ln", "lab")
    val r = PairMining.ordered(PairMining.coOccurrence(lines, "bk", "ln", "lab"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq == Seq(("metal", "rock", 2L), ("jazz", "rock", 1L)))
  }

  test("coOccurrence handles duplicate line ids (total order per basket)") {
    val lines = Seq((1L, 1, "a"), (1L, 1, "b"), (1L, 1, "c")).toDF("bk", "ln", "lab")
    val r = PairMining.coOccurrence(lines, "bk", "ln", "lab").collect()
    assert(r.map(_.getLong(2)).sum == 3L) // C(3,2) distinct-label pairs
  }

  test("key-pair expansion + label join-back matches per-label coOccurrence") {
    // keys repeat across baskets and labels repeat across keys — the
    // exact shape of the s04 family (partkey pairs, labels joined after).
    val lines = Seq(
      (1L, 1, 101L), (1L, 2, 102L), (1L, 3, 103L),
      (2L, 1, 104L), (2L, 2, 101L)).toDF("bk", "ln", "k")
    val dim = Seq(
      (101L, "rock", "b1"), (102L, "rock", "b2"), (103L, "metal", "b1"),
      (104L, "jazz", "b3")).toDF("k", "genre", "brand")
    val pairs = PairMining.coOccurrenceKeyPairs(lines, "bk", "k")
    // every position pair appears exactly once in the exploded relation
    assert(pairs.count() == 3 + 1)
    for (lab <- Seq("genre", "brand")) {
      val labeled = lines.join(dim, "k")
        .select(col("bk"), col("ln"), col(lab).as("lab"))
      val one = PairMining.coOccurrence(labeled, "bk", "ln", "lab")
      val viaKeys = pairs
        .join(dim.select(col("k").as("k_a"), col(lab).as("la")), Seq("k_a"))
        .join(dim.select(col("k").as("k_b"), col(lab).as("lb")), Seq("k_b"))
        .filter(col("la") =!= col("lb"))
        .groupBy(least(col("la"), col("lb")).as("label_a"),
          greatest(col("la"), col("lb")).as("label_b"))
        .agg(count(lit(1)).as("pair_count"))
      assert(viaKeys.exceptAll(one).isEmpty && one.exceptAll(viaKeys).isEmpty,
        s"label $lab diverges")
    }
  }

  test("duplicate keys in a basket contribute no same-key pair after label join") {
    val lines = Seq((1L, 1, 101L), (1L, 2, 101L), (1L, 3, 102L)).toDF("bk", "ln", "k")
    val dim = Seq((101L, "rock"), (102L, "metal")).toDF("k", "genre")
    val pairs = PairMining.coOccurrenceKeyPairs(lines, "bk", "k")
    assert(pairs.count() == 3) // C(3,2) position pairs, (101,101) included
    val counted = pairs
      .join(dim.select(col("k").as("k_a"), col("genre").as("la")), Seq("k_a"))
      .join(dim.select(col("k").as("k_b"), col("genre").as("lb")), Seq("k_b"))
      .filter(col("la") =!= col("lb"))
      .groupBy(least(col("la"), col("lb")).as("label_a"),
        greatest(col("la"), col("lb")).as("label_b"))
      .agg(count(lit(1)).as("pair_count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(counted.toSeq == Seq(("metal", "rock", 2L)))
  }
}

class ExactSpec extends SparkSpec {
  import spark.implicits._

  test("sumMoney is exact regardless of partitioning") {
    val vals = Seq.fill(1000)(0.1)
    val one = vals.toDF("v").repartition(1).agg(Exact.sumMoneyD(col("v"))).first().getDouble(0)
    val many = vals.toDF("v").repartition(7).agg(Exact.sumMoneyD(col("v"))).first().getDouble(0)
    assert(one == many && one == 100.0)
  }

  test("lineRevenue applies the engine-wide revenue convention at 4 decimals") {
    val df = Seq((10.0, 0.25)).toDF("l_extendedprice", "l_discount")
    assert(df.select(Exact.sumRevenueD).first().getDouble(0) == 7.5)
  }
}

class AsOfSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp
  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("lastBefore picks the latest strictly-earlier right row per key") {
    val left = Seq((1L, ts(10), "p1"), (1L, ts(30), "p2"), (2L, ts(5), "p3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(9)), (1L, ts(10)), (1L, ts(29)), (2L, ts(50)))
      .toDF("k", "t")
    val r = graft.ops.AsOf.lastBefore(left, right, Seq("k"), "t", "t")
      .orderBy("tag").collect()
      .map(x => (x.getAs[String]("tag"), Option(x.getAs[Timestamp]("asof_ts"))))
    assert(r.toSeq == Seq(
      ("p1", Some(ts(9))),   // strict: equal-ts right at 10:10 excluded
      ("p2", Some(ts(29))),
      ("p3", None)))         // no earlier click for key 2
  }

  test("inclusive mode admits equal-timestamp right rows") {
    val left = Seq((1L, ts(10), "p1")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(10))).toDF("k", "t")
    val r = graft.ops.AsOf.lastBefore(left, right, Seq("k"), "t", "t",
      strict = false).collect()
    assert(r(0).getAs[Timestamp]("asof_ts") == ts(10))
  }

  test("null keys never match: null-key left gets null, null-key right is ignored") {
    val left = Seq(
      (Option(1L), Option(ts(10)), "valid"),
      (None: Option[Long], Option(ts(10)), "null_key"),
      (Option(1L), None: Option[Timestamp], "null_ts"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Option(1L), Option(ts(5))),
      (None: Option[Long], Option(ts(9))),   // must never be carried
      (Option(1L), None: Option[Timestamp])) // must never be carried
      .toDF("k", "t")
    val r = graft.ops.AsOf.lastBefore(left, right, Seq("k"), "t", "t")
      .collect().map(x =>
        x.getAs[String]("tag") -> Option(x.getAs[Timestamp]("asof_ts"))).toMap
    assert(r == Map(
      "valid" -> Some(ts(5)), "null_key" -> None, "null_ts" -> None))
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches overlapping bands, exclusive upper edge") {
    val points = Seq((1L, 8.0), (2L, 15.0), (3L, 7.9), (4L, 99.0)).toDF("id", "v")
    val bands = Seq((0L, 0.0, 15.0), (1L, 8.0, 23.0)).toDF("band", "lo", "hi")
    val r = graft.ops.RangeJoin.pointInInterval(points, bands, "v", "lo", "hi", 8.0)
      .select("id", "band").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r == Set((1L, 0L), (1L, 1L), (2L, 1L), (3L, 0L)))
  }

  test("binned range join equals the naive inequality join") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 100)).toDF("id", "v")
    val bands = (0 until 12).map(i => (i.toLong, i * 7.5, i * 7.5 + 20.0)).toDF("band", "lo", "hi")
    val fast = graft.ops.RangeJoin.pointInInterval(points, bands, "v", "lo", "hi", 10.0)
      .select("id", "band")
    val naive = points.join(bands, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }
}

class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp
  import org.apache.spark.sql.graftfn.AsOfJoinNative
  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("native exec matches the composed as-of on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 400).map(i =>
      (rnd.nextInt(20).toLong, ts(rnd.nextInt(59)), i.toLong)).toDF("k", "t", "id")
    val right = (1 to 300).map(_ =>
      (rnd.nextInt(20).toLong, ts(rnd.nextInt(59)))).toDF("k", "t")
    val native = AsOfJoinNative.lastBefore(left, right, Seq("k"), "t", "t")
      .select("id", "asof_ts")
    val composed = graft.ops.AsOf.lastBefore(left, right, Seq("k"), "t", "t")
      .select("id", "asof_ts")
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    assert(native.count() == 400)
  }

  test("native exec handles strict vs inclusive ties like the composed op") {
    val left = Seq((1L, ts(10), "p")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(10))).toDF("k", "t")
    val strict = AsOfJoinNative.lastBefore(left, right, Seq("k"), "t", "t").first()
    val incl = AsOfJoinNative.lastBefore(left, right, Seq("k"), "t", "t",
      strict = false).first()
    assert(strict.isNullAt(strict.fieldIndex("asof_ts")))
    assert(incl.getAs[Timestamp]("asof_ts") == ts(10))
  }

  test("native and composed agree on null keys and null timestamps") {
    val left = Seq(
      (Option(1L), Option(ts(10)), 1L),
      (None: Option[Long], Option(ts(10)), 2L),
      (Option(1L), None: Option[Timestamp], 3L),
      (Option(2L), Option(ts(20)), 4L))
      .toDF("k", "t", "id")
    val right = Seq(
      (Option(1L), Option(ts(5))),
      (None: Option[Long], Option(ts(9))),
      (Option(1L), None: Option[Timestamp]))
      .toDF("k", "t")
    val native = AsOfJoinNative.lastBefore(left, right, Seq("k"), "t", "t")
      .select("id", "asof_ts")
    val composed = graft.ops.AsOf.lastBefore(left, right, Seq("k"), "t", "t")
      .select("id", "asof_ts")
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    // and the semantics are the ASOF ones: only the valid row matches
    val byId = native.collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(byId(1L) == ts(5) && byId(2L) == null && byId(3L) == null && byId(4L) == null)
  }

  test("native exec orders integer and double ts columns correctly") {
    val leftI = Seq((1L, 100, "a"), (1L, 5, "b")).toDF("k", "t", "tag")
    val rightI = Seq((1L, 7), (1L, 99)).toDF("k", "t")
    val ri = AsOfJoinNative.lastBefore(leftI, rightI, Seq("k"), "t", "t")
      .collect().map(x => x.getAs[String]("tag") -> x.get(x.fieldIndex("asof_ts"))).toMap
    // with a Long hard-cast this would either throw or compare garbage;
    // interpreted Int ordering gives 99 (not 7) as the match for t=100
    assert(ri == Map("a" -> 99, "b" -> null))

    val leftD = Seq((1L, 2.5, "a")).toDF("k", "t", "tag")
    val rightD = Seq((1L, 2.4), (1L, 2.6)).toDF("k", "t")
    val rd = AsOfJoinNative.lastBefore(leftD, rightD, Seq("k"), "t", "t")
      .collect().map(x => x.getAs[String]("tag") -> x.get(x.fieldIndex("asof_ts"))).toMap
    assert(rd == Map("a" -> 2.4))
  }

  test("native exec rejects mismatched ts column types at plan time") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 1.5)).toDF("k", "t")
    val e = intercept[Exception] {
      AsOfJoinNative.lastBefore(left, right, Seq("k"), "t", "t").collect()
    }
    assert(e.getMessage.contains("as-of ts types differ"), e.getMessage)
  }

  test("native exec plans AsOfJoinExec with co-partitioned sorted children") {
    val left = Seq((1L, ts(1), 1L)).toDF("k", "t", "id")
    val right = Seq((1L, ts(0))).toDF("k", "t")
    val df = AsOfJoinNative.lastBefore(left, right, Seq("k"), "t", "t")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(p.contains("Exchange hashpartitioning(k"), p)
    assert(p.contains("Sort [k"), p)
    assert(df.count() == 1)
  }
}
