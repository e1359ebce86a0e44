package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join and watermark dedup driven through real
  * Structured Streaming (file source -> watermark -> memory sink),
  * checked against their batch twins in operators/Windowed.scala. The
  * join's time bound is what keeps stream state finite — without it the
  * engine would buffer both sides forever.
  */
class StreamJoinSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private def eventStream(dir: String): DataFrame =
    Tables.eventsStream(spark, dir)

  private def stage(): String = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = Files.createTempDirectory("graft_sjoin")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("stream-stream interval join equals the batch stream_interval_join") {
    val dir = stage()
    val c = eventStream(dir).filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("cts"))
      .withWatermark("cts", "2 hours")
    val p = eventStream(dir).filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
      .withWatermark("pts", "2 hours")
    val joined = c.join(p, col("cu") === col("pu") &&
        col("pts") > col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"))

    val q = joined.writeStream.format("memory")
      .queryName("sjoin_smoke").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sjoin_smoke").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = operators.Windowed.queries("stream_interval_join")(spark, sf)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming dropDuplicates keeps exactly one event per dedup key") {
    val dir = stage()
    val deduped = eventStream(dir)
      .withWatermark("ts", "2 hours")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"))

    val q = deduped.writeStream.format("memory")
      .queryName("sdedup_smoke").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sdedup_smoke").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = operators.Windowed.queries("stream_dedup")(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // within a micro-batch "first arrival" is partition-order-dependent,
    // so the streaming check pins key-set semantics (one row per key,
    // same key set); the batch query pins exact values via the oracle
    assert(got.size == got.toSet.size, "duplicate keys survived dedup")
    assert(got.toSet == want.toSet)
    assert(want.size == want.toSet.size)
  }
}
