package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry/oracle consistency gate. The driver's correctness sweep is
  * only as strong as the registry it walks: a query that silently loses
  * its oracle entry degrades to a weaker rows-only check with no signal
  * anywhere. This spec makes that drift a test failure — every query
  * oracle-gated, every oracle attached to a real query, every SQL string
  * substantive. No SparkSession needed; this is pure map hygiene. */
class RegistrySpec extends AnyFunSuite {

  test("every registered query has a DuckDB oracle (full 100% gate, no silent rows-only fallbacks)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracle (driver would silently weaken their check): $missing")
  }

  test("every oracle key names a registered query (no orphans)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
  }

  test("oracle SQL strings are substantive and carry the total-order contract") {
    // single-row global aggregates: order is vacuous, ORDER BY waived
    val oneRowAggregates = Set("x01_dedup_exact", "q01_null", "q08_churn_rate",
      "x50_sketch_recall", "x86_classifier_confusion",
      "x90_classifier_calibrated", "x112_dsir_enrichment",
      "x112b_topk_enrichment", "x112c_budget_enrichment")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // the driver's compare is row-order-sensitive — every oracle must
      // end in a deterministic ORDER BY (the Spark side mirrors it)
      assert(oneRowAggregates.contains(name) ||
        sql.toUpperCase.contains("ORDER BY"),
        s"$name: oracle has no ORDER BY — hash compare would be order-lucky")
    }
  }

  test("family slices are key-disjoint (Map ++ would silently shadow a clash)") {
    // Round-14 advice: RegistrySpec only pinned Chinook-vs-Extensions
    // disjointness; a duplicate key BETWEEN two family files would be
    // swallowed by the union. Σ slice sizes = union size makes it loud.
    val ext = graft.queries.Extensions
    assert(ext.querySlices.map(_._2.size).sum == ext.queries.size,
      "a query key is shared between two family slices: " +
        ext.querySlices.combinations(2).flatMap { case Seq((a, ma), (b, mb)) =>
          val c = ma.keySet intersect mb.keySet
          if (c.nonEmpty) Some(s"$a∩$b=$c") else None
        }.mkString("; "))
    assert(ext.oracleSlices.map(_._2.size).sum == ext.oracleSql.size,
      "an oracle key is shared between two family slices: " +
        ext.oracleSlices.combinations(2).flatMap { case Seq((a, ma), (b, mb)) =>
          val c = ma.keySet intersect mb.keySet
          if (c.nonEmpty) Some(s"$a∩$b=$c") else None
        }.mkString("; "))
  }

  test("registry names are unique across the two query sources") {
    val chinook = graft.queries.Chinook.queries.keySet
    val ext = graft.queries.Extensions.queries.keySet
    val clash = chinook intersect ext
    assert(clash.isEmpty, s"duplicate query names (one silently shadows): $clash")
  }

  test("documented suite/test counts match the source tree (SURVEY.md, PLANS.md)") {
    // Round-15 verdict #5: PLANS claimed 281 tests while the tree ran
    // 280 — the registry-count pin discipline, extended to the suite
    // inventory. Ground truth is a source scan: every suite in this
    // tree registers tests as literal `test("...")` calls (grep-checked
    // — no property()/it()/loop registration), so the scan equals the
    // runtime count; introducing dynamic registration means rewriting
    // this gate, deliberately. Each doc carries machine-checkable
    // "<S> suites, <T> tests" markers.
    val dir = new java.io.File("src/test/scala/graft")
    val texts = dir.listFiles().filter(_.getName.endsWith(".scala")).map { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.mkString finally src.close()
    }
    val suites = texts.map(
      raw"class +\w+ +extends +(SparkSpec|AnyFunSuite)".r.findAllIn(_).size).sum
    val tests = texts.map(raw"(?m)^\s*test\(".r.findAllIn(_).size).sum
    val marker = raw"(\d+) (?:ScalaTest )?suites, (\d+) tests".r
    Seq("SURVEY.md", "PLANS.md").foreach { f =>
      val text = {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.mkString finally src.close()
      }
      val found = marker.findAllMatchIn(text)
        .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
      assert(found.nonEmpty,
        s"$f: no '<S> suites, <T> tests' marker — add one so the counts are gated")
      assert(found.forall(_ == ((suites, tests))),
        s"$f documents ${found.distinct.mkString("/")}; the tree has " +
          s"($suites suites, $tests tests) — sync the doc")
    }
  }

  test("documented registry count matches the code (SURVEY.md, README.md)") {
    // Round-6 lesson: three queries landed in a snapshot commit while
    // SURVEY/README kept the old counts for a full round. Each doc now
    // carries exactly one machine-checkable marker of the form
    // "<N> oracle-gated quer..." that this gate pins to the registry.
    val n = SparkEntry.queries.size
    val marker = raw"(\d+) oracle-gated quer".r
    Seq("SURVEY.md", "README.md").foreach { f =>
      val text = {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.mkString finally src.close()
      }
      val counts = marker.findAllMatchIn(text).map(_.group(1).toInt).toSeq
      assert(counts.nonEmpty,
        s"$f: no '<N> oracle-gated quer...' marker — add one so the count is gated")
      assert(counts.forall(_ == n),
        s"$f documents ${counts.distinct.mkString("/")} oracle-gated queries; " +
          s"the registry has $n — sync the doc")
    }
  }
}
