package org.apache.spark.sql.graftfn

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Exact Gram (second-moment) matrix of a QUANTIZED embedding column as a
  * TypedImperativeAggregate (SURVEY.md §7.4) — the covariance/PCA-prep
  * reduction of an embedding pipeline (whitening, low-rank diagnostics,
  * spectral dedup all start from X'X).
  *
  * `gram_matrix(q, d)` over a long-array column of fixed dimension `d`
  * returns the upper triangle as (i, j, sum) structs with
  * sum = Σ_rows q[i]·q[j], an EXACT integer — the buffer is one
  * long[d(d+1)/2] per partial, updated with a JVM loop.
  *
  * Why not the declarative form: posexplode-pairs writes d(d+1)/2 rows
  * PER INPUT ROW into a shuffle (2080× amplification at d=64 — the
  * oracle can afford it at test scale; a corpus scan cannot), and the
  * HOF form re-enters expression dispatch per element. Here the scan
  * side does arithmetic only; what moves between executors is one
  * fixed-size triangle per partial aggregate, merged cell-wise — the
  * same partial-aggregation contract as built-in sums.
  *
  * Overflow discipline: with the 2^10 fixed-point scale (Extensions
  * .GramScale) and unit-magnitude embeddings, |q[i]·q[j]| < 2^20, so
  * long sums are exact past 10^12 rows. Integer cells also make the
  * result bit-stable under any partitioning (sum order is irrelevant),
  * which is what lets a DuckDB oracle hash-match it.
  */
case class GramMatrix(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {
  require(d >= 1, "gram_matrix needs d >= 1")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_matrix"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType), StructField("j", LongType),
    StructField("sum_q", LongType))), containsNull = false)

  private val cells = d * (d + 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() != d)
        throw new IllegalArgumentException(
          s"gram_matrix(d=$d) got a vector of length ${arr.numElements()}")
      val q = arr.toLongArray()
      var i = 0
      var c = 0
      while (i < d) {
        val qi = q(i)
        var j = i
        while (j < d) {
          buf(c) += qi * q(j)
          j += 1; c += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var c = 0
    while (c < cells) { b1(c) += b2(c); c += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val rows = new Array[Any](cells)
    var i = 0
    var c = 0
    while (i < d) {
      var j = i
      while (j < d) {
        rows(c) = InternalRow(i.toLong, j.toLong, buf(c))
        j += 1; c += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(cells * 8)
    val out = new DataOutputStream(bos)
    var c = 0
    while (c < cells) { out.writeLong(buf(c)); c += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](cells)
    var c = 0
    while (c < cells) { buf(c) = in.readLong(); c += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren.head)
}

object GramMatrix {
  /** Column-API entry point: `df.agg(GramMatrix.of(col("q"), 64))`. */
  def of(c: Column, d: Int): Column =
    ExpressionUtils.column(
      GramMatrix(ExpressionUtils.expression(c), d).toAggregateExpression())
}
