package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: run the Bench warm-up phases in isolation with per-phase
  * wall times (plus the [gwarm] per-item lines from Graph.prewarm), so
  * warm-up cost is attributable without a full bench run.
  * Usage: runMain graft.WarmProbe [sfDir]
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[warmprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    phase("tables") {
      Tables.all.foreach { t =>
        try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
      }
      spark.range(1000000).selectExpr("id % 10 AS k").groupBy("k").count().count()
    }
    phase("bucketed")(operators.Bucketed.prepare(spark, sfDir))
    phase("layout")(operators.Layout.prewarm(spark, sfDir))
    phase("dedup")(operators.Dedup.prewarm(spark, sfDir))
    phase("sim")(operators.Sim.prewarm(spark, sfDir))
    phase("graph")(operators.Graph.prewarm(spark, sfDir))
    spark.stop()
  }
}
