/** TypedImperativeAggregate top-k — the SURVEY §7 "hard stretch" item.
  *
  * Exact top-k (value, key) pairs per group in ONE aggregation pass:
  * bounded k-element heaps as partial state, merged map-side then reduce-
  * side like any partial aggregate. At scale this replaces the
  * window/row_number formulation, which must shuffle and fully sort every
  * group; the heap aggregate shuffles only k rows per group per map
  * partition.
  */
package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k largest (value, key) pairs under
  * (value DESC, key ASC) ordering — i.e. the pair with the SMALLEST value
  * (largest key on ties) is evicted first.
  */
final class TopKBuffer(val k: Int) {
  // heap with the WEAKEST kept pair on top (non-implicit: must not leak
  // into sortBy's tuple ordering below)
  private val weakestFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan { (a, b) =>
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2
    }
  val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(weakestFirst)

  def add(v: Double, key: Long): Unit = {
    if (heap.size < k) heap.enqueue((v, key))
    else {
      val w = heap.head // weakest kept pair
      if (v > w._1 || (v == w._1 && key < w._2)) {
        heap.dequeue(); heap.enqueue((v, key))
      }
    }
  }

  /** Sorted best-first: value DESC, key ASC. */
  def sorted: Seq[(Double, Long)] =
    heap.toSeq.sortBy { case (v, key) => (-v, key) }
}

case class TopKByValue(
    valueExpr: Expression,
    keyExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(valueExpr, keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("val", DoubleType), StructField("key", LongType))),
    containsNull = false)
  override def prettyName: String = "topk_by_value"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = valueExpr.eval(input)
    val key = keyExpr.eval(input)
    if (v != null && key != null)
      b.add(v.asInstanceOf[Double], key.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    o.heap.foreach { case (v, key) => b.add(v, key) }
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map { case (v, key) =>
      InternalRow(v, key)
    }.toArray[Any])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.heap.size)
    b.heap.foreach { case (v, key) => out.writeDouble(v); out.writeLong(key) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new TopKBuffer(k)
    (1 to n).foreach(_ => b.add(buf.getDouble, buf.getLong))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByValue =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByValue =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByValue =
    copy(valueExpr = newChildren(0), keyExpr = newChildren(1))
}

object TopKAgg {
  /** agg column: array<struct<val,key>> of the k largest values. */
  def topk_by_value(value: Column, key: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByValue(ExpressionUtils.expression(value),
        ExpressionUtils.expression(key), k).toAggregateExpression())
}
