package org.apache.spark.sql.graftfn

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of regexp matches in a string — `size(regexp_extract_all(s, re))`
  * without materializing the match array.
  *
  * Why (SURVEY.md §7.4): the engine's text featurization counts pattern
  * occurrences in projections that use the matches for nothing else
  * (langId's CJK-codepoint score, standalone token counting) and the
  * built-in spelling allocates an ArrayData of every match string per row
  * only to take its length. This expression runs the
  * same java.util.regex matcher loop and returns the count directly — no
  * per-match UTF8String slices, no array allocation — and stays inside
  * whole-stage codegen (the generated code is one virtual call into
  * [[countIn]], same pattern as Spark's own regexp expressions, which keep
  * a per-operator compiled-Pattern cache exactly like the one here).
  *
  * Queries never need to call it: [[CountMatchesRule]] rewrites the
  * built-in spelling during optimization, so the DataFrame/SQL surface
  * stays 100% standard and the oracle twin (DuckDB `len(regexp_extract_
  * all(...))`) is unaffected. Null in either operand → null, matching
  * `size()` under the default (non-legacy) sizeOfNull semantics.
  */
case class CountMatches(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "count_matches"

  // Compiled-pattern cache, re-checked per row because the regex operand
  // may be non-foldable; for the common literal-regex case this compiles
  // exactly once per operator instance (the idiom of RegExpExtractBase).
  @transient private var lastRegex: UTF8String = _
  @transient private var compiled: Pattern = _

  def countIn(s: UTF8String, regex: UTF8String): Int = {
    if (compiled == null || lastRegex != regex) {
      lastRegex = regex.clone()
      compiled = Pattern.compile(regex.toString)
    }
    val m = compiled.matcher(s.toString)
    var c = 0
    while (m.find()) c += 1
    c
  }

  override protected def nullSafeEval(s: Any, r: Any): Any =
    countIn(s.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countMatches", this)
    nullSafeCodeGen(ctx, ev, (s, r) => s"${ev.value} = $ref.countIn($s, $r);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMatches =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: `size(regexp_extract_all(s, re, 0))` → `count_matches`.
  *
  * Fires only when the rewrite is a pure win:
  *  - group 0 (full-match extraction, the counting idiom);
  *  - default sizeOfNull semantics (`legacySizeOfNull = true` makes
  *    `size(null)` return -1, which the null-propagating replacement
  *    would not honor);
  *  - the match array is used NOWHERE ELSE in the same plan node. When a
  *    sibling column also consumes `regexp_extract_all` (x08's
  *    `array_distinct(t)`, say), codegen subexpression elimination
  *    already evaluates the regex once per row and `size` just reads the
  *    array length — rewriting there would ADD a second matcher pass on
  *    top of the array that still gets built. Occurrences are counted per
  *    node on canonicalized subtrees, matching the per-operator scope of
  *    codegen CSE.
  *
  * Registered both through `SparkSessionExtensions.injectOptimizerRule`
  * (the spark.sql.extensions deployment path) and idempotently on live
  * sessions by GraftSession.
  */
object CountMatchesRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case node =>
      val uses = scala.collection.mutable.HashMap.empty[Expression, Int]
      node.expressions.foreach(_.foreach {
        case r: RegExpExtractAll =>
          uses.updateWith(r.canonicalized)(c => Some(c.getOrElse(0) + 1))
        case _ => ()
      })
      node.transformExpressions {
        case Size(r @ RegExpExtractAll(subject, regexp, Literal(0, IntegerType)), false)
            if uses.getOrElse(r.canonicalized, 0) == 1 =>
          CountMatches(subject, regexp)
      }
  }
}
