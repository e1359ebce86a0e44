package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Custom stateful streaming: mapGroupsWithState carrying a per-user
  * running max across micro-batches, checked against the batch result.
  * This is the KeyValueGroupedDataset + GroupState surface a production
  * sessionization/state pipeline uses.
  */
class StatefulStreamingSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("mapGroupsWithState per-user running max equals batch max") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = Files.createTempDirectory("graft_state")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val updates = Tables.eventsStream(spark, dir.toString)
      .select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Double]) =>
          val mx = (rows.map(_._2) ++ state.getOption.iterator).max
          state.update(mx)
          (user, mx)
      }

    val q = updates.toDF("user_id", "max_value").writeStream
      .format("memory").queryName("state_smoke").outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    // last update per user is the final running max
    val got = spark.table("state_smoke").groupBy("user_id")
      .agg(max("max_value").as("mx")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap

    val want = Tables(spark, sf, "events").groupBy("user_id")
      .agg(max("value").as("mx")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap

    assert(got == want)
    assert(got.nonEmpty)
  }
}
