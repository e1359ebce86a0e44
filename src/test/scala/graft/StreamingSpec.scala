package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming smoke: the same tumbling-window aggregation the
  * batch `stream_tumbling` query runs, driven through readStream (file
  * source) + watermark + memory sink, then checked equal to the batch
  * result. This is the demonstration that the Windowed pack's plans run
  * unchanged under streaming execution.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("streaming tumbling-window agg equals batch result") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val stream = Tables.eventsStream(spark, dir.toString)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val q = stream.writeStream.format("memory")
      .queryName("stream_smoke").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("stream_smoke").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val want = Tables(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(got == want)
    assert(got.nonEmpty)
  }
}
