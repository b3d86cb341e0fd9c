package org.apache.spark.sql.graftfn

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a TypedImperativeAggregate
  * (SURVEY.md §7.4 — the custom-aggregate extension point).
  *
  * `heavy_hitters(col, k)` returns up to k (item, count_lower) structs:
  * every item with true frequency > n/(k+1) is guaranteed present, and
  * each reported count is a lower bound within n/(k+1) of the truth. The
  * buffer holds at most k counters regardless of input size and partial
  * buffers MERGE exactly (count-sum, then subtract the (k+1)-th largest
  * and drop non-positives — the standard mergeable-summaries result), so
  * the shuffle carries O(k) state per group where an exact
  * groupBy-count-orderBy carries the full distinct set. That is the
  * 100 TB "top domains / top tokens / hottest keys" operator.
  *
  * Result order (count desc, item asc) is deterministic, but counts are
  * lower bounds that depend on partition interleaving — like every MG
  * implementation. Exactness guarantees, not bit-stability, are the
  * contract (asserted in PropertySpec/EngineSpec); there is no DuckDB
  * oracle for it.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with ExpectsInputTypes {
  require(k >= 1, "heavy_hitters needs k >= 1")

  // The update path reads the child as UTF8String; declaring the input
  // type makes heavy_hitters(non_string, k) an ANALYSIS error (with an
  // implicit cast where one exists) instead of a mid-job
  // ClassCastException.
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count_lower", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key.clone(), 1L)
        case None => // decrement-all step; drop exhausted counters
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.foreach { case (kk, c) =>
            if (c == 1L) dead += kk else buf.update(kk, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
                     b2: mutable.HashMap[UTF8String, Long])
  : mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (kk, c) => b1.update(kk, b1.getOrElse(kk, 0L) + c) }
    if (b1.size > k) {
      val kth = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      b1.foreach { case (kk, c) =>
        if (c - kth <= 0L) dead += kk else b1.update(kk, c - kth)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) => InternalRow(item, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) =>
      val b = kk.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

object HeavyHitters {
  /** Column-API entry point: `df.agg(HeavyHitters.of(col("domain"), 10))`. */
  def of(c: Column, k: Int): Column =
    ExpressionUtils.column(
      HeavyHitters(ExpressionUtils.expression(c), k).toAggregateExpression())
}
