package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** foreachBatch custom-sink pattern: the hook every production pipeline
  * uses to land streaming micro-batches in systems without a native
  * connector (JDBC upsert, COPY bulk-load — exactly the reference's sink,
  * `/root/reference/src/ParquetImporter.php:96-125`, driven by a stream).
  * Pins the contract the exactly-once pattern rests on: batchIds are
  * monotonically increasing and deterministic per epoch, so an
  * idempotent sink can dedupe on (batchId) after a replay.
  */
class ForeachBatchSinkSpec extends AnyFunSuite {
  import TestSpark.spark

  test("foreachBatch receives every row exactly once with ordered batch ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, Long)]
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    val arrival = new java.util.concurrent.CopyOnWriteArrayList[Long]()

    val q = in.toDF().toDF("ts", "id")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the idempotent-sink pattern: transactionally write rows keyed
        // by batchId; a replayed batch overwrites, never duplicates
        arrival.add(batchId)
        seen.put(batchId, batch.select("id").collect().map(_.getLong(0)).toSeq.sorted)
        ()
      }
      .start()

    def t(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    in.addData((t(1), 1L), (t(2), 2L)); q.processAllAvailable()
    in.addData((t(3), 3L)); q.processAllAvailable()
    q.stop()

    // ARRIVAL order (not a re-sorted copy) must be strictly increasing
    // with no duplicate batch ids — the property idempotent sinks key on
    val ids = arrival.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(ids.length >= 2, s"expected >=2 batches, got ${ids.toSeq}")
    assert(ids.zip(ids.tail).forall { case (a, b) => a < b },
      s"batch ids not strictly increasing in arrival order: ${ids.toSeq}")
    val all = ids.flatMap(seen.get(_)).sorted
    assert(all.toSeq == Seq(1L, 2L, 3L), s"rows lost or duplicated: ${all.toSeq}")
  }
}
