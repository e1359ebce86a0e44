/** TypedImperativeAggregate Gramian — the mergeable-state substrate for
  * covariance / correlation / PCA-prep over embedding columns.
  *
  * One pass accumulates n, the per-dimension sums Σq_i, and the upper
  * triangle of the product matrix Σq_i·q_j from already-QUANTIZED integer
  * vectors (the caller scales float components by 2^20 and rounds — the
  * emb_kmeans/emb_norm_outliers exactness discipline), so the aggregate's
  * state is exact integers: merge order cannot change a bit, and a DuckDB
  * replay of the same sums matches hash-for-hash. State is d + d(d+1)
  * longs (64 dims → 4 224 longs ≈ 34 KB) regardless of row count — the
  * map-side-combining shape that computes a 100 TB covariance matrix with
  * ONE scan and a 34 KB shuffle payload per partition, where the naive
  * posexplode²-then-group plan multiplies the corpus by d²/2 rows.
  *
  * Overflow posture: each product term |q_i·q_j| ≤ 2^40 (|q| ≤ 2^20 for
  * unit-norm inputs), and the products accumulate in TWO 64-bit limbs —
  * a full signed 128-bit accumulator per triangle entry — so Σq_iq_j is
  * exact for any row count a 128-bit integer can hold (n ≤ 2^87; a prior
  * single-long accumulator wrapped SILENTLY past n ≈ 2^22 vectors per
  * final aggregate, well inside 100 TB corpus sizes). The remaining
  * bounds are GUARDED, not assumed: Σq_i stays in one long up to
  * n = 2^43 rows (≈ 8.8×10^12 vectors — past a 100 TB corpus of 64-dim
  * embeddings) and eval's DECIMAL(38,0) output holds |Σq_iq_j| < 10^38
  * (n ≲ 2^86); both fail fast with an explicit error instead of wrapping.
  * A vector whose length differs from `dim` throws (schema drift must
  * never silently skew n — the footer-schema fail-fast discipline).
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

/** n, per-dim sums (d longs), upper-triangle products as signed 128-bit
  * two-limb accumulators (d(d+1)/2 hi/lo long pairs, row-major:
  * (0,0..d-1), (1,1..d-1), …).
  */
final class GramianBuffer(val dim: Int) {
  var n: Long = 0L
  val sums = new Array[Long](dim)
  val prodHi = new Array[Long](dim * (dim + 1) / 2)
  val prodLo = new Array[Long](dim * (dim + 1) / 2)

  /** 128-bit += of a sign-extended 64-bit term: standard two's-complement
    * carry-out of the unsigned low-limb add, plus the term's sign
    * extension into the high limb.
    */
  @inline private def add128(idx: Int, v: Long): Unit = {
    val lo = prodLo(idx)
    val nl = lo + v
    val carry = ((lo & v) | ((lo | v) & ~nl)) >>> 63
    prodLo(idx) = nl
    prodHi(idx) += (v >> 63) + carry
  }

  def add(q: Array[Long]): Unit = {
    n += 1
    var i = 0
    var idx = 0
    while (i < dim) {
      sums(i) += q(i)
      val qi = q(i)
      var j = i
      while (j < dim) {
        add128(idx, qi * q(j))
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
    while (k < prodLo.length) {
      val lo = prodLo(k)
      val olo = o.prodLo(k)
      val nl = lo + olo
      val carry = ((lo & olo) | ((lo | olo) & ~nl)) >>> 63
      prodLo(k) = nl
      prodHi(k) += o.prodHi(k) + carry
      k += 1
    }
    GramianBuffer.guardSums(n)
  }

  /** Signed 128-bit (hi, lo) → BigInt: hi carries the sign, lo is the
    * unsigned low limb.
    */
  def prod(k: Int): BigInt =
    (BigInt(prodHi(k)) << 64) + (BigInt(prodLo(k)) & GramianBuffer.mask64)
}

object GramianBuffer {
  private[graft] val mask64: BigInt = (BigInt(1) << 64) - 1
  /** Σq_i is a single long: exact while n·2^20 < 2^63. Fail fast at the
    * documented bound instead of wrapping (the limit is ~8.8e12 vectors
    * per FINAL aggregate — past any 100 TB embedding corpus, but a wrap
    * here must be an error, never a wrong answer).
    */
  private[graft] def guardSums(n: Long): Unit =
    require(n < (1L << 43),
      s"gramian_of: $n rows exceeds the 2^43 exact-sum bound for 2^20-quantized components")
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
    StructField("p", ArrayType(DecimalType(38, 0), containsNull = false), nullable = false)))
  override def prettyName: String = "gramian_of"

  override def createAggregationBuffer(): GramianBuffer = new GramianBuffer(dim)

  override def update(b: GramianBuffer, input: InternalRow): GramianBuffer = {
    val v = vecExpr.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gramian_of: vector of length ${arr.numElements()} in a dim=$dim aggregate " +
          "(schema drift — refuse, never silently skip)")
      b.add(arr.toLongArray())
    }
    b
  }

  override def merge(b: GramianBuffer, o: GramianBuffer): GramianBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: GramianBuffer): Any = {
    GramianBuffer.guardSums(b.n)
    val p = new Array[Any](b.prodLo.length)
    var k = 0
    while (k < p.length) {
      // Decimal(38,0) holds |v| < 10^38 ≈ 2^126; changePrecision rejects
      // anything wider (fail fast, the guardSums posture)
      p(k) = Decimal(BigDecimal(b.prod(k)), 38, 0)
      k += 1
    }
    InternalRow(b.n, new GenericArrayData(b.sums.map(Long.box)),
      new GenericArrayData(p))
  }

  override def serialize(b: GramianBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    b.sums.foreach(out.writeLong)
    b.prodHi.foreach(out.writeLong)
    b.prodLo.foreach(out.writeLong)
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
    while (k < b.prodHi.length) { b.prodHi(k) = buf.getLong; k += 1 }
    var m = 0
    while (m < b.prodLo.length) { b.prodLo(m) = buf.getLong; m += 1 }
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
  /** agg column: struct<n, s: array<long>, p: array<decimal(38,0)>> —
    * count, per-dim sums, upper-triangle products of a quantized vector
    * column (products exact at any corpus size via the two-limb 128-bit
    * accumulator).
    */
  def gramian_of(vec: Column, dim: Int): Column =
    ExpressionUtils.column(
      GramianOf(ExpressionUtils.expression(vec), dim).toAggregateExpression())
}
