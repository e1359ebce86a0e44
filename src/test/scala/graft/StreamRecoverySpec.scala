package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery — the streaming property production actually
  * depends on: a stateful query stopped and RESTARTED from its
  * checkpoint must resume its aggregation state (and its source offsets)
  * rather than starting over. The test runs a per-key count over a file
  * source in two separate query incarnations sharing one checkpoint:
  * the restarted query sees ONLY the newly-arrived file, yet its
  * emitted totals cover both batches — state restored; and the batch-1
  * file is not reprocessed — offsets restored. Uses update-mode
  * foreachBatch (the memory sink truncates on restart, which would hide
  * exactly what this spec pins).
  */
class StreamRecoverySpec extends AnyFunSuite {
  import TestSpark.spark

  test("stateful aggregation and source offsets survive a stop/restart from checkpoint") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_recov_src").toString
    val ckpt = Files.createTempDirectory("graft_recov_ckpt").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))

    val emitted = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    var rowsSeenInRun2 = 0L

    def runOnce(countRows: Boolean): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .groupBy("k").agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.collect()
          if (countRows) rowsSeenInRun2 += rows.length
          rows.foreach(r => emitted.put(r.getAs[Long]("k"), r.getAs[Long]("n")))
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // batch 1: 100 rows, keys 0..4 (20 each)
    spark.range(100).selectExpr("id % 5 AS k", "id AS v")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce(countRows = false)
    assert((0L to 4L).forall(k => emitted.get(k) == 20L),
      s"run 1 totals wrong: $emitted")

    // batch 2: 50 more rows, keys 0..4 (10 each), then RESTART from ckpt
    spark.range(100, 150).selectExpr("id % 5 AS k", "id AS v")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce(countRows = true)

    // state recovered: totals cover BOTH files...
    assert((0L to 4L).forall(k => emitted.get(k) == 30L),
      s"restart lost state — totals $emitted should be 30 per key (20 + 10)")
    // ...and offsets recovered: the restarted run emitted only the 5
    // updated keys once, not a reprocessing of batch 1
    assert(rowsSeenInRun2 == 5L,
      s"restarted query re-emitted $rowsSeenInRun2 rows — batch 1 was reprocessed")
  }
}
