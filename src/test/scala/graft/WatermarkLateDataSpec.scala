package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics under late data: append-mode windowed counts must
  * drop events that arrive after the watermark has passed their window,
  * and streaming dropDuplicates must dedupe within the watermark horizon.
  * Uses a MemoryStream so batch boundaries (and thus watermark advances)
  * are controlled exactly — a file-source test can't force lateness.
  */
class WatermarkLateDataSpec extends AnyFunSuite {
  import TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("append-mode windowed agg drops events later than the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, Long)]
    val agg = in.toDF().toDF("ts", "v")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_late")
      .outputMode("append").start()
    def drain(): Unit = q.processAllAvailable()

    // batch 1: two events in [10:00,10:10) — watermark -> 10:04
    in.addData((ts(8), 1L), (ts(9), 2L)); drain()
    // batch 2: advance event time to 10:30 — watermark passes 10:10,
    // closing the first window (emitted in append mode)
    in.addData((ts(30), 3L)); drain()
    // batch 3: a LATE event for the closed [10:00,10:10) window — must
    // be dropped, not resurrect the window
    in.addData((ts(5), 4L)); drain()
    // batch 4: push watermark far ahead so the [10:30,10:40) window
    // also closes and everything pending is emitted
    in.addData((ts(59), 5L)); drain()
    q.stop()

    val rows = spark.table("wm_late").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(rows("2026-01-01 10:00:00.0") == 2L,
      s"late event must not be re-counted into the closed window: $rows")
    assert(rows("2026-01-01 10:30:00.0") == 1L)
  }

  test("streaming dropDuplicates dedupes within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, Long)]
    val dd = in.toDF().toDF("ts", "id")
      .withWatermark("ts", "5 minutes")
      .dropDuplicates("id")
    val q = dd.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()

    in.addData((ts(1), 100L), (ts(2), 100L), (ts(3), 101L))
    q.processAllAvailable()
    in.addData((ts(4), 100L)) // duplicate within horizon -> dropped
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("wm_dedup").collect().map(_.getLong(1)).sorted
    assert(ids.toSeq == Seq(100L, 101L), s"got ${ids.toSeq}")
  }
}
