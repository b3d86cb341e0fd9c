package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.{CountMatches, CountMatchesRule}

/** Specs for the count_matches optimizer rewrite (SURVEY §7.4 — the
  * Rule[LogicalPlan] rung of the Catalyst extension ladder): the built-in
  * `size(regexp_extract_all(...))` spelling must be replaced during
  * optimization without any observable semantic change. */
class CountMatchesSpec extends SparkSpec {
  import spark.implicits._

  private def countMatchesIn(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.collect { case n =>
      n.expressions.flatMap(_.collect { case c: CountMatches => c })
    }.flatten

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    if (!prev.contains(CountMatchesRule))
      spark.experimental.extraOptimizations = prev :+ CountMatchesRule
    // keep literal-DataFrame plans inspectable: without this the whole
    // projection constant-folds into a LocalRelation before we can look
    val prevExcluded = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try body finally {
      spark.experimental.extraOptimizations = prev
      prevExcluded match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
        case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
      }
    }
  }

  test("rule rewrites size(regexp_extract_all) and preserves results incl. nulls") {
    withRule {
      val df = Seq[String]("a1 b2 c3", "", "xyz", null).toDF("text")
        .select(size(regexp_extract_all(col("text"), lit("[a-z][0-9]"), lit(0))).as("n"))
      val opt = df.queryExecution.optimizedPlan
      assert(countMatchesIn(opt).nonEmpty, s"rewrite did not fire:\n$opt")
      assert(!opt.toString.contains("regexp_extract_all"), opt.toString)
      val r = df.collect().map(x => if (x.isNullAt(0)) null else x.getInt(0))
      assert(r.toSeq == Seq(3, 0, 0, null))
    }
  }

  test("rule leaves group-index extraction untouched") {
    withRule {
      val g1 = Seq("a1").toDF("text")
        .select(size(regexp_extract_all(col("text"), lit("([a-z])[0-9]"), lit(1))).as("n"))
      assert(g1.queryExecution.optimizedPlan.toString.contains("regexp_extract_all"))
      assert(g1.first().getInt(0) == 1)
    }
  }

  test("count_matches recompiles when the regex operand is a column") {
    withRule {
      val df = Seq(("aaa", "a"), ("abab", "ab")).toDF("text", "re")
        .select(size(regexp_extract_all(col("text"), col("re"), lit(0))).as("n"))
      assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 2))
    }
  }

  test("rule bails when sibling expressions still materialize the match array") {
    withRule {
      // tokenStats' siblings (array_distinct, aggregate) consume the same
      // regexp_extract_all — codegen CSE already evaluates it once, so a
      // rewrite would ADD a matcher pass; the rule must not fire.
      val df = graft.ext.TextOps.tokenStats(Seq("the cat sat").toDF("text"))
        .select("n_tokens", "n_distinct_tokens")
      val opt = df.queryExecution.optimizedPlan
      assert(countMatchesIn(opt).isEmpty,
        s"rewrite fired despite sibling array use:\n$opt")
      val r = df.first()
      assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    }
  }

  test("langId rewrites exactly the CJK score — the one count with no other array use") {
    withRule {
      val df = graft.ext.TextOps.langId(Seq("你好 the cat").toDF("text"))
      val opt = df.queryExecution.optimizedPlan
      val cms = countMatchesIn(opt)
      assert(cms.size == 1, s"expected exactly the CJK-score rewrite:\n$opt")
      assert(df.select("score_zh").first().getLong(0) == 2L)
    }
  }
}
