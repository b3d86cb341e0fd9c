package org.apache.spark.sql.graftfn

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-loop hash-sketch expressions (SURVEY.md §7.4): tf-weighted SimHash
  * and MinHash signatures. Both have exact built-in formulations (nested
  * aggregate/transform md5 chains — kept verbatim in the DuckDB oracle,
  * see graft.queries.Extensions), but the interpreted HOF evaluation costs
  * ~2 µs per md5 invocation in expression-tree dispatch; at 32 hashes ×
  * every token occurrence that dominated the dedup queries. These
  * expressions run the same md5 loops as compiled Scala.
  *
  * Parity contract with the oracle's `md5(j::VARCHAR || '|' || tok)`:
  *  - sign test `first hex char >= '8'` ⇔ high bit of digest byte 0;
  *  - lexicographic MIN of lowercase-hex strings ⇔ unsigned byte-wise
  *    MIN of raw digests (hex encoding is order-preserving).
  */
private[graftfn] object Md5Util {
  val md: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Precomputed "j|" prefixes as bytes. */
  def prefixes(n: Int): Array[Array[Byte]] =
    (0 until n).map(j => (j.toString + "|").getBytes("UTF-8")).toArray

  private val hexChars = "0123456789abcdef".toCharArray

  def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** a < b as unsigned byte arrays (equal-length md5 digests). */
  def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF; val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** `bits`-bit tf-weighted SimHash of a token array (see Dedup.simhash for
  * the algorithm and the rationale for tf weighting). */
case class SimHash(child: Expression, bits: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(bits >= 1 && bits <= 63)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  @transient private lazy val prefixes = Md5Util.prefixes(bits)

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = new Array[Int](bits)
    val md = Md5Util.md.get()
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i).getBytes
      var j = 0
      while (j < bits) {
        md.reset()
        md.update(prefixes(j))
        md.update(tok)
        // first hex char >= '8'  ⇔  high bit of byte 0 set
        if ((md.digest()(0) & 0x80) != 0) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < bits) { if (sums(j) > 0) h |= 1L << j; j += 1 }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** MinHash signature: for each permutation i, the lexicographic minimum of
  * md5("i|" + element) in lowercase hex, over a (shingle) string array.
  * Empty input → array of `perms` nulls (matching `array_min` over an
  * empty transform). */
case class MinHashSignature(child: Expression, perms: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(perms >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val prefixes = Md5Util.prefixes(perms)

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](perms)
    if (n > 0) {
      val mins = new Array[Array[Byte]](perms)
      val md = Md5Util.md.get()
      var i = 0
      while (i < n) {
        val el = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < perms) {
          md.reset()
          md.update(prefixes(j))
          md.update(el)
          val d = md.digest()
          if (mins(j) == null || Md5Util.lessThan(d, mins(j))) mins(j) = d
          j += 1
        }
        i += 1
      }
      var j = 0
      while (j < perms) { out(j) = Md5Util.toHex(mins(j)); j += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object HashSketches {
  def simhash(toks: Column, bits: Int): Column =
    ExpressionUtils.column(SimHash(ExpressionUtils.expression(toks), bits))

  def minhashSignature(elems: Column, perms: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(elems), perms))
}
