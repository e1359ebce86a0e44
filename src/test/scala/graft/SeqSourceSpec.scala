package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DataSourceV2 connector must prune at the source: a pushed
  * `id < N` bound narrows the generated range (rows past it never
  * exist), and projection prunes generated columns.
  */
class SeqSourceSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val s = TestSpark.spark

  private def seq(rows: Long, parts: Int) =
    s.read.format("graft.sources.SeqDataSource")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  test("pushed range bound narrows generation at the source") {
    val df = seq(1000000, 4).filter(col("id") < 100).select("id")
    df.collect()
    val scan = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }.head
    // the scan itself reports the narrowed range, not the full million
    assert(scan.scan.description().contains("range=[0,100)"),
      scan.scan.description())
    assert(df.count() == 100)
  }

  test("column pruning reaches the generator") {
    val df = seq(1000, 2).select("tag")
    df.collect()
    val scan = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }.head
    assert(scan.scan.description().contains("cols=tag"), scan.scan.description())
  }

  test("scan runs the vectorized path (columnar until ColumnarToRow)") {
    val df = seq(10000, 2).select("id", "v", "tag")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scan = collectWithSubqueries(plan) { case b: BatchScanExec => b }.head
    assert(scan.supportsColumnar, "batch scan should advertise columnar output")
    assert(plan.toString.contains("ColumnarToRow"), plan.toString)
    // values identical to the row path's contract
    val r = df.filter(col("id") === 9999).collect()(0)
    assert(r.getDouble(1) == ((9999L * 7919L) % 10007L).toDouble / 10007.0)
    assert(r.getString(2) == "t4")
  }

  test("source plans its own partitions and respects bounds across them") {
    val df = seq(100, 8).filter(col("id") >= 90)
    assert(df.count() == 10)
    assert(df.rdd.getNumPartitions <= 8)
  }
}
