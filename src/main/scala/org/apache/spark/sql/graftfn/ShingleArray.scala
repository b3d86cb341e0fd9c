package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct w-token shingles of a token array, space-joined — a JVM-loop
  * replacement for the interpreted higher-order formulation
  * `array_distinct(transform(sequence(1, n-w+1), i ->
  * concat_ws(' ', slice(toks, i, w))))`.
  *
  * Why (SURVEY.md §7.4 preference order): the built-in HOF chain evaluates
  * four nested interpreted expressions per shingle (sequence
  * materialization, slice allocation, concat_ws, lambda dispatch) — it
  * measured ~8 s for 5 000 documents at sf0.1, dominating every
  * shingle-based dedup query. This expression does one pass over the
  * token array with a LinkedHashSet (insertion order == first occurrence,
  * exactly array_distinct's order), building each shingle with
  * UTF8String.concatWs — no per-element expression dispatch.
  * CodegenFallback: the loop itself is JIT-compiled Scala; fallback only
  * costs one virtual call per row, irrelevant next to the loop body.
  *
  * Semantics (must stay in lockstep with the DuckDB oracle's
  * list_distinct/list_transform/list_slice formulation — see
  * graft.queries.Extensions.shinglesCte): < w tokens → empty array;
  * consumers use the result order-insensitively, so the two engines'
  * distinct orders need not match.
  */
case class ShingleArray(child: Expression, w: Int, dedupe: Boolean = true)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(w >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingle_array"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) new GenericArrayData(Array.empty[Any])
    else {
      // LinkedHashSet when deduping (insertion order == first occurrence,
      // array_distinct's order); plain sequence otherwise (every
      // occurrence, for frequency-weighted consumers).
      val sink: java.util.Collection[UTF8String] =
        if (dedupe) new java.util.LinkedHashSet[UTF8String]((n - w + 1) * 2)
        else new java.util.ArrayList[UTF8String](n - w + 1)
      val parts = new Array[UTF8String](w)
      var i = 0
      while (i <= n - w) {
        var j = 0
        while (j < w) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        sink.add(UTF8String.concatWs(space, parts: _*))
        i += 1
      }
      val out = new Array[Any](sink.size)
      val it = sink.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  def shingles(toks: Column, w: Int): Column =
    ExpressionUtils.column(ShingleArray(ExpressionUtils.expression(toks), w))

  /** Every w-gram occurrence, in document order (no dedup). */
  def shingleOccurrences(toks: Column, w: Int): Column =
    ExpressionUtils.column(
      ShingleArray(ExpressionUtils.expression(toks), w, dedupe = false))
}
