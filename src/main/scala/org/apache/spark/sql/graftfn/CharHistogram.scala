package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd bucketed CODEPOINT histogram of a string: bucket b counts
  * the code points cp with cp mod `buckets` = b. The cheap per-document
  * summary behind the Ed-Join content filter (x62, round 16): one unit
  * edit moves at most one code point in and one out, so
  * ED(a, b) ≥ L1(hist(a), hist(b)) / 2 — see [[L1DistanceLong]] — and
  * bucket collisions only LOWER the L1, so the bound survives hashing.
  * Code points (not UTF-16 units or UTF-8 bytes) because Spark's
  * `levenshtein` edits code points: a histogram over smaller units
  * would need a weaker constant (4 resp. 8 per substitution) and lose
  * most of the filter's selectivity on multi-byte text.
  *
  * Computed ONCE per document into the cached verification relation —
  * O(len) per row there vs O(k·len) per candidate PAIR for the banded
  * Levenshtein it guards. Null string → null histogram. */
case class CharHistogram(child: Expression, buckets: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "char_histogram"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val h = new Array[Long](buckets)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h(cp % buckets) += 1L
      i += Character.charCount(cp)
    }
    new GenericArrayData(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $a.toString();
         |long[] $h = new long[$buckets];
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h[$cp % $buckets] += 1L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($h);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharHistogram =
    copy(child = newChild)
}

object CharHistogram {
  /** Column-API entry point. */
  def of(s: Column, buckets: Int): Column =
    ExpressionUtils.column(CharHistogram(ExpressionUtils.expression(s), buckets))
}

/** Codegen'd L1 distance over two array<bigint> columns (Σ |a_i − b_i|;
  * a missing trailing element counts as 0). The pair-side half of the
  * x62 content filter — same tight-primitive-loop rationale as
  * [[DotProductLong]] (the `aggregate(zip_with(...))` spelling is
  * interpreted per element and breaks whole-stage codegen). */
case class L1DistanceLong(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "l1_distance_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.max(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val xi = if (i < x.numElements() && !x.isNullAt(i)) x.getLong(i) else 0L
      val yi = if (i < y.numElements() && !y.isNullAt(i)) y.getLong(i) else 0L
      s += math.abs(xi - yi)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.max($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = ($i < $a.numElements() && !$a.isNullAt($i)) ? $a.getLong($i) : 0L;
         |  long $yi = ($i < $b.numElements() && !$b.isNullAt($i)) ? $b.getLong($i) : 0L;
         |  $s += java.lang.Math.abs($xi - $yi);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L1DistanceLong =
    copy(left = newLeft, right = newRight)
}

object L1DistanceLong {
  /** Column-API entry point. */
  def l1(a: Column, b: Column): Column =
    ExpressionUtils.column(
      L1DistanceLong(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
