package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 arbitrary-state API (transformWithState / StatefulProcessor —
  * the successor of mapGroupsWithState): per-key running counters backed
  * by the RocksDB state store, the production configuration for large
  * keyspaces (state spills to disk instead of executor heap).
  */
class CountProcessor extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val c = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(c)
    Iterator((key, c))
  }
}

class TransformWithStateSpec extends AnyFunSuite {
  import TestSpark.spark

  test("per-key running counts survive across micro-batches in RocksDB state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val out = in.toDS()
        .groupByKey(_._1)
        .transformWithState(new CountProcessor, TimeMode.None(), OutputMode.Update())
        .toDF("user", "running")
      val q = out.writeStream.format("memory").queryName("tws")
        .outputMode("update").start()

      in.addData((1L, 10L), (1L, 11L), (2L, 20L)); q.processAllAvailable()
      in.addData((1L, 12L)); q.processAllAvailable()
      q.stop()

      val rows = spark.table("tws").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // batch 1 emits (1,2) and (2,1); batch 2 emits (1,3) — state carried
      assert(rows.contains((1L, 2L)) && rows.contains((2L, 1L)), rows.toSeq.toString)
      assert(rows.contains((1L, 3L)), s"state not carried across batches: ${rows.toSeq}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
