package org.apache.spark.sql.graftfn

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the engine's custom expressions, so text
  * queries (`spark.sql`) can call them exactly like built-ins:
  *
  *   SELECT simhash(tokens, 32), dot_product_long(a, b),
  *          minhash_signature(shingles, 16), shingle_array(tokens, 3)
  *
  * Two registration paths:
  *  - `GraftFunctions.register(spark)` — imperative, for an existing
  *    session (used by Verify/Bench/tests);
  *  - `spark.sql.extensions=org.apache.spark.sql.graftfn.GraftExtensions`
  *    — the SparkSessionExtensions injection point, the idiomatic way to
  *    ship the engine as a cluster-wide library (set once in
  *    spark-defaults.conf; every session on the cluster gets the
  *    functions with no code changes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(e.injectFunction)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => CountMatchesRule)
  }
}

object GraftFunctions {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** (identifier, info, builder) triples — the FunctionDescription shape
    * SparkSessionExtensions.injectFunction expects. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_product_long"),
      (es: Seq[Expression]) => DotProductLong(es(0), es(1))),
    (FunctionIdentifier("shingle_array"),
      new ExpressionInfo(classOf[ShingleArray].getName, "shingle_array"),
      (es: Seq[Expression]) => ShingleArray(es(0), intArg(es(1), "shingle width"))),
    (FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash"),
      (es: Seq[Expression]) => SimHash(es(0), intArg(es(1), "simhash bits"))),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (es: Seq[Expression]) => MinHashSignature(es(0), intArg(es(1), "perm count"))),
    (FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "heavy_hitters"),
      (es: Seq[Expression]) => HeavyHitters(es(0), intArg(es(1), "k"))),
    (FunctionIdentifier("winnow_array"),
      new ExpressionInfo(classOf[WinnowArray].getName, "winnow_array"),
      (es: Seq[Expression]) => WinnowArray(es(0),
        intArg(es(1), "k-gram width"), intArg(es(2), "winnow window"))))

  /** Register on a live session (temp functions in its registry). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    descriptions.foreach { case (ident, _, builder) =>
      reg.createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
  }
}
