package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** Round-2 operator packs: sampling, reshape/semantics, CDC/funnel flow,
  * bucketed join. Correctness against the DuckDB oracle is the driver
  * gate; these specs pin the invariants the oracle can't see (plan
  * shape, determinism across runs, sample-rate bounds).
  */
class RoundTwoOpsSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("sample_hash_bernoulli rate is ~10% and stable across runs") {
    val q = operators.Sample.queries("sample_hash_bernoulli")
    val total = Tables(s, dir, "lineitem").count().toDouble
    val n1 = q(s, dir).count()
    val n2 = q(s, dir).count()
    assert(n1 == n2, "hash sampling must be deterministic")
    val rate = n1 / total
    assert(rate > 0.07 && rate < 0.13, s"rate $rate out of bounds")
  }

  test("sample_stratified returns exactly 20 docs per language") {
    import org.apache.spark.sql.functions._
    val per = operators.Sample.queries("sample_stratified")(s, dir)
      .groupBy("lang").count().collect()
    assert(per.length == 5 && per.forall(_.getLong(1) == 20L))
  }

  test("reshape_unpivot emits one row per (input row, measure)") {
    import org.apache.spark.sql.functions._
    val in = Tables(s, dir, "lineitem").filter(col("l_orderkey") % 100 === 0).count()
    val out = operators.Reshape.queries("reshape_unpivot")(s, dir)
    assert(out.count() == in * 4)
    assert(out.select("metric").distinct().count() == 4)
  }

  test("cdc_upsert applies updates in place and appends inserts") {
    import org.apache.spark.sql.functions._
    val base = Tables(s, dir, "orders")
    val nBase = base.count()
    val nIns = base.filter(col("o_orderkey") % 13 === 0).count()
    val out = operators.Flow.queries("cdc_upsert")(s, dir)
    assert(out.count() == nBase + nIns)
    // every 7th order is updated to status U; untouched rows keep status
    val nU = out.filter(col("o_orderstatus") === "U").count()
    val nUpd = base.filter(col("o_orderkey") % 7 === 0).count()
    assert(nU == nUpd)
  }

  test("funnel stages are monotonically decreasing") {
    val r = operators.Flow.queries("funnel_conversion")(s, dir).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p && p >= 0)
    assert(v > 0, "funnel must observe at least one view")
  }

  test("join_bucketed never shuffles on the join key, even as SMJ") {
    // disable broadcast so the large-large (bucket-to-bucket sort-merge)
    // path is exercised — the 100 TB case where bucketing matters
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = operators.Bucketed.queries("join_bucketed")(s, dir)
      df.collect() // materialize so AQE finalizes the plan
      val plan = df.queryExecution.executedPlan
      // the tiny 5-group aggregate + final orderBy may exchange on
      // o_orderpriority; the JOIN KEY must never be shuffled — buckets
      // already co-locate it
      val keyExchanges = collectWithSubqueries(plan) {
        case e: Exchange if e.outputPartitioning.toString.contains("orderkey") => e
      }
      assert(keyExchanges.isEmpty,
        s"bucketed join must not shuffle on the join key:\n${plan.treeString}")
      val smj = collectWithSubqueries(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, s"expected sort-merge join:\n${plan.treeString}")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("tfidf ranks at most 5 terms per doc, rank keys deterministic") {
    import org.apache.spark.sql.functions._
    val out = operators.Text.queries("text_tfidf")(s, dir)
    val worst = out.groupBy("doc_id").count().agg(max("count")).collect()(0).getLong(0)
    assert(worst <= 5)
  }
}
