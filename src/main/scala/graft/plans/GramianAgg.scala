/** TypedImperativeAggregate Gramian — the mergeable-state substrate for
  * covariance / correlation / PCA-prep over embedding columns.
  *
  * One pass accumulates n, the per-dimension sums Σq_i, and the upper
  * triangle of the product matrix Σq_i·q_j from already-QUANTIZED integer
  * vectors (the caller scales float components by 2^20 and rounds — the
  * emb_kmeans/emb_norm_outliers exactness discipline), so the aggregate's
  * state is exact integers: merge order cannot change a bit, and a DuckDB
  * replay of the same sums matches hash-for-hash. State is d + d(d+1)/2
  * longs (64 dims → 2 144 longs ≈ 17 KB) regardless of row count — the
  * map-side-combining shape that computes a 100 TB covariance matrix with
  * ONE scan and a 17 KB shuffle payload per partition, where the naive
  * posexplode²-then-group plan multiplies the corpus by d²/2 rows.
  *
  * Overflow bound: |q| ≤ 2^20 (unit-norm inputs), so Σq_iq_j ≤ n·2^40 —
  * exact in a signed 64-bit long up to n ≈ 2^22 vectors per FINAL
  * aggregate. Past that, split the accumulator into two limbs (the
  * dq_checksum BIGINT-limb discipline) or quantize at 2^16.
  */
package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** n, per-dim sums (d longs), upper-triangle products (d(d+1)/2 longs,
  * row-major: (0,0..d-1), (1,1..d-1), …).
  */
final class GramianBuffer(val dim: Int) {
  var n: Long = 0L
  val sums = new Array[Long](dim)
  val prods = new Array[Long](dim * (dim + 1) / 2)

  def add(q: Array[Long]): Unit = {
    n += 1
    var i = 0
    var idx = 0
    while (i < dim) {
      sums(i) += q(i)
      val qi = q(i)
      var j = i
      while (j < dim) {
        prods(idx) += qi * q(j)
        idx += 1
        j += 1
      }
      i += 1
    }
  }

  def mergeFrom(o: GramianBuffer): Unit = {
    n += o.n
    var i = 0
    while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
    var k = 0
    while (k < prods.length) { prods(k) += o.prods(k); k += 1 }
  }
}

case class GramianOf(
    vecExpr: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramianBuffer] {

  override def children: Seq[Expression] = Seq(vecExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("p", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "gramian_of"

  override def createAggregationBuffer(): GramianBuffer = new GramianBuffer(dim)

  override def update(b: GramianBuffer, input: InternalRow): GramianBuffer = {
    val v = vecExpr.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) b.add(arr.toLongArray())
    }
    b
  }

  override def merge(b: GramianBuffer, o: GramianBuffer): GramianBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: GramianBuffer): Any =
    InternalRow(b.n, new GenericArrayData(b.sums.map(Long.box)),
      new GenericArrayData(b.prods.map(Long.box)))

  override def serialize(b: GramianBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    b.sums.foreach(out.writeLong)
    b.prods.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramianBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new GramianBuffer(dim)
    b.n = buf.getLong
    var i = 0
    while (i < b.sums.length) { b.sums(i) = buf.getLong; i += 1 }
    var k = 0
    while (k < b.prods.length) { b.prods(k) = buf.getLong; k += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): GramianOf =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramianOf =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramianOf =
    copy(vecExpr = newChildren(0))
}

object GramianAgg {
  /** agg column: struct<n, s: array<long>, p: array<long>> — count,
    * per-dim sums, upper-triangle products of a quantized vector column.
    */
  def gramian_of(vec: Column, dim: Int): Column =
    ExpressionUtils.column(
      GramianOf(ExpressionUtils.expression(vec), dim).toAggregateExpression())
}
