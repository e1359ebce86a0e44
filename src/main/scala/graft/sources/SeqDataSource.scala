package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-sequence DataSourceV2 — the engine's custom
  * source demonstration (the reference's only source is a parquet file
  * reader, `/root/reference/src/Readers/CodercatParquetRowReader.php`;
  * this is the engine-grade equivalent of writing a new connector).
  *
  * Schema: (id BIGINT, v DOUBLE, tag STRING) with
  *   v   = ((id * 7919) % 10007) / 10007.0   (one exact double division)
  *   tag = 't' || (id % 5)
  *
  * Scale features a real connector needs, all implemented:
  *  - `planInputPartitions` splits the id range into `partitions` chunks —
  *    the source, not the driver, defines parallelism;
  *  - `SupportsPushDownFilters` accepts </<=/>/>= on `id` and narrows the
  *    GENERATED range (source-level partition pruning — pushed rows are
  *    never materialized);
  *  - `SupportsPushDownRequiredColumns` prunes generation to the
  *    projected columns.
  *
  * Usage: `spark.read.format("graft.sources.SeqDataSource")
  *   .option("rows", n).option("partitions", p).load()`.
  */
class SeqDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqDataSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SeqDataSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

class SeqTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, partitions)
}

class SeqScanBuilder(rows: Long, partitions: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqDataSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case LessThan("id", _: Number) => true
      case LessThanOrEqual("id", _: Number) => true
      case GreaterThan("id", _: Number) => true
      case GreaterThanOrEqual("id", _: Number) => true
      case _ => false
    }
    accepted.foreach {
      case LessThan("id", v: Number) => hi = math.min(hi, v.longValue())
      case LessThanOrEqual("id", v: Number) => hi = math.min(hi, v.longValue() + 1)
      case GreaterThan("id", v: Number) => lo = math.max(lo, v.longValue() + 1)
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue())
      case _ =>
    }
    pushed = accepted
    rejected // Spark re-applies everything it keeps; accepted ones are exact
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(lo, math.max(lo, hi), partitions, required)
}

case class SeqRange(lo: Long, hi: Long) extends InputPartition

class SeqScan(lo: Long, hi: Long, partitions: Int, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq range=[$lo,$hi) partitions=$partitions cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, partitions)
    val span = math.max(0L, hi - lo)
    val step = math.max(1L, (span + n - 1) / n)
    (0 until n).iterator
      .map(i => SeqRange(lo + i * step, math.min(hi, lo + (i + 1) * step)))
      .filter(r => r.lo < r.hi).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SeqRange(lo, hi) = partition.asInstanceOf[SeqRange]
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var id = lo - 1
      override def next(): Boolean = { id += 1; id < hi }
      override def get(): InternalRow = {
        val vals: Array[Any] = fields.map {
          case "id" => id
          case "v" => ((id * 7919L) % 10007L).toDouble / 10007.0
          case "tag" => UTF8String.fromString("t" + (id % 5))
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }

  /** Vectorized path: fill 4K-row ColumnarBatches directly — the scan
    * stays columnar until Spark's ColumnarToRow boundary, like the
    * built-in parquet reader. PartitionReaderFactory advertises it via
    * supportColumnarReads, so Spark picks this over the row reader.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val SeqRange(lo, hi) = partition.asInstanceOf[SeqRange]
    val batchSize = 4096
    new PartitionReader[ColumnarBatch] {
      private var cursor = lo
      private var batch: ColumnarBatch = _

      override def next(): Boolean = {
        if (cursor >= hi) return false
        val n = math.min(batchSize.toLong, hi - cursor).toInt
        val vectors = required.fields.map(f => new OnHeapColumnVector(n, f.dataType))
        var i = 0
        while (i < n) {
          val id = cursor + i
          var c = 0
          while (c < required.fields.length) {
            required.fields(c).name match {
              case "id" => vectors(c).putLong(i, id)
              case "v" => vectors(c).putDouble(i, ((id * 7919L) % 10007L).toDouble / 10007.0)
              case "tag" =>
                val b = ("t" + (id % 5)).getBytes("UTF-8")
                vectors(c).putByteArray(i, b, 0, b.length)
            }
            c += 1
          }
          i += 1
        }
        if (batch != null) batch.close()
        batch = new ColumnarBatch(vectors.toArray[ColumnVector], n)
        cursor += n
        true
      }

      override def get(): ColumnarBatch = batch
      override def close(): Unit = if (batch != null) batch.close()
    }
  }
}
