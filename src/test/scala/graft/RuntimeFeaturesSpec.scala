package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime-optimization features that only matter at scale: injected
  * bloom-filter runtime filters (row pruning on the probe side of a
  * selective join before the shuffle) and the observe() metrics API
  * (pipeline counters without a second pass).
  */
class RuntimeFeaturesSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("runtime bloom filter is injected on the probe side of a selective join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // default is 10GB — the feature targets huge probe-side scans; at
      // test scale the threshold must drop for the rewrite to fire
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      // force the non-broadcast path so the runtime filter is the only
      // pre-shuffle pruning available (the 100 TB shape)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val big = Tables(s, dir, "lineitem")
      val sel = Tables(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
      val df = big.join(sel, big("l_orderkey") === sel("o_orderkey"))
        .groupBy("o_orderpriority").count()
      df.collect()
      val p = df.queryExecution.optimizedPlan.toString +
        df.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("bloom"),
        s"expected an injected bloom runtime filter:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    // child session so the test-scale skew thresholds never leak into
    // other queries' plans (same isolation Layout.bloomSession uses)
    val c = s.newSession()
    c.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    c.conf.set("spark.sql.shuffle.partitions", "4")
    c.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    c.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    c.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    // half the left side lands on key 0 — the celebrity-key shape
    val left = c.range(200000).selectExpr("IF(id % 2 = 0, 0L, id) AS k", "id AS v")
    val right = c.range(1000).selectExpr("id AS k", "id * 2 AS w")
    val df = left.join(right, "k")
    // count()/write() plan their own QueryExecution and leave df's
    // unexecuted (isFinalPlan=false); collect() runs THIS dataset's plan
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"AQE did not mark/split the skewed join partition:\n$p")
  }

  test("observe() collects pipeline metrics without a second pass") {
    val observed = Tables(s, dir, "lineitem")
      .observe("ingest_metrics",
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("total_qty"),
        max(col("l_shipdate")).as("latest_ship"))
      .filter(col("l_quantity") > 25)
    // collect() runs THIS dataset's QueryExecution — count() would build
    // a separate one and the observed metrics would land there instead
    val kept = observed.collect().length
    val metrics = observed.queryExecution.observedMetrics("ingest_metrics")
    val total = metrics.getAs[Long]("n_rows")
    assert(total > kept, s"metrics must see pre-filter rows: $total vs $kept")
    assert(metrics.getAs[Double]("total_qty") > 0.0)
  }
}
