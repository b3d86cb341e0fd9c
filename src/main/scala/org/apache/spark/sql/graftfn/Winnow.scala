package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer et al., SIGMOD'03) over a
  * token array: md5 every POSITIONAL k-gram, slide a `win`-hash window,
  * keep each window's minimum, dedupe in first-occurrence order.
  *
  * Why an expression (SURVEY.md §7.4 preference order): the built-in
  * formulation `array_distinct(transform(starts, j -> array_min(slice(
  * hashes, j, win))))` with `hashes = transform(sequence(1, m), i ->
  * md5(concat_ws(' ', slice(toks, i, k))))` is correct but ruinous —
  * higher-order functions evaluate on the interpreted path with no
  * common-subexpression reuse, so the `hashes` subtree embedded in the
  * outer lambda is re-derived for EVERY window (O(m²) md5s per document;
  * 335 s cold on the 30× scale soak), and staging the subtrees into
  * their own projection columns does not survive CollapseProject, which
  * folds adjacent projections straight back into the nested form. This
  * loop hashes each k-gram once into its raw digest, selects window
  * minima by unsigned byte comparison (hex encoding is order-preserving,
  * so raw-digest MIN ⇔ the oracle's lexicographic hex MIN — the
  * Md5Util parity contract), and hex-encodes only the selected
  * fingerprints: O(m·win) compares, O(m) md5s, zero per-element
  * expression dispatch.
  *
  * Semantics (lockstep with the DuckDB oracle's list_transform/list_min/
  * list_slice formulation — see graft.queries.Extensions.winnowCte):
  * < k tokens → empty array; fewer hashes than the window → one global
  * min; consumers are order-insensitive, so the two engines' distinct
  * orders need not match. Guarantee: documents sharing any run of
  * ≥ k+win−1 tokens share at least one fingerprint. */
case class WinnowArray(child: Expression, k: Int, win: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k >= 1, "k-gram width must be >= 1")
  require(win >= 1, "winnow window must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "winnow_array"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) new GenericArrayData(Array.empty[Any])
    else {
      val m = n - k + 1
      val md = Md5Util.md.get()
      val digests = new Array[Array[Byte]](m)
      var i = 0
      while (i < m) {
        md.reset()
        var j = 0
        while (j < k) {
          if (j > 0) md.update(' '.toByte)
          // The SQL-registered winnow_array is user-callable with e.g.
          // array('a', NULL, 'b'); a silent NPE deep in digest code is the
          // wrong failure. Null tokens have no defined k-gram semantics
          // (the oracle's list formulation would diverge too) — reject
          // them loudly. Production callers feed tokens(), which never
          // yields nulls.
          val tok = arr.getUTF8String(i + j)
          if (tok == null) throw new IllegalArgumentException(
            s"winnow_array: null token at position ${i + j}; " +
              "token arrays must not contain NULL elements")
          md.update(tok.getBytes)
          j += 1
        }
        digests(i) = md.digest()
        i += 1
      }
      val starts = math.max(m - win + 1, 1)
      // LinkedHashSet: first-occurrence order, array_distinct's contract
      val sink = new java.util.LinkedHashSet[UTF8String](starts * 2)
      var s = 0
      while (s < starts) {
        val end = math.min(s + win, m)
        var best = digests(s)
        var t = s + 1
        while (t < end) {
          if (Md5Util.lessThan(digests(t), best)) best = digests(t)
          t += 1
        }
        sink.add(Md5Util.toHex(best))
        s += 1
      }
      val out = new Array[Any](sink.size)
      val it = sink.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowArray =
    copy(child = newChild)
}

object WinnowArray {
  def winnow(toks: Column, k: Int, win: Int): Column =
    ExpressionUtils.column(WinnowArray(ExpressionUtils.expression(toks), k, win))
}
