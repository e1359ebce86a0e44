package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 pins.
  *
  *  - `sim_ivf_incremental`'s stats planner (the r14 verdict's top ask)
  *    selects the scoring leg — ADC or exact full-vector — from the
  *    candidate volume. The two legs share the probe, the top-64 cut
  *    discipline, and the exact re-rank tail, so wherever the cut does
  *    NOT bind (≤ 64 candidates for a query's probed cells) both legs
  *    re-rank the identical candidate set and must return identical
  *    rows. That equivalence is what makes the planner a pure
  *    performance choice below the cut — pinned here; the binding case
  *    (where ADC ordering genuinely decides survivors) is pinned by
  *    RoundTenOpsSpec's replay and the clustered recall gate.
  */
class RoundFifteenOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("sim_ivf_incremental: ADC and exact legs agree wherever the top-64 cut is non-binding") {
    val nonBinding = operators.Sim.incrCandCounts(s, dir)
      .filter(col("ncand") <= 64)
      .join(operators.Sim.incrBmem(s, dir), Seq("qrep"))
      .select("q_id")
    def rowsOf(adc: Boolean): Seq[String] =
      operators.Sim.ivfIncrementalWith(s, dir, Some(adc))
        .join(nonBinding, Seq("q_id"), "left_semi")
        .collect().map(_.toString).sorted.toSeq
    val adcRows = rowsOf(adc = true)
    val exactRows = rowsOf(adc = false)
    assert(adcRows.nonEmpty,
      "vacuous: every query's cut binds at this sf — the agreement pin has no coverage")
    assert(adcRows == exactRows,
      s"legs diverged on a non-binding query: first diff ${
        adcRows.zip(exactRows).find(p => p._1 != p._2)}")
  }

  test("batchAdjOf prune is lossless: batch-closed triangles equal the full-adjacency probe") {
    // synthetic md5-parity graph, dense enough to close triangles: the
    // pruned adjacency (sources restricted to batch endpoints) must be
    // a superset of everything the wedge probe and the closing-edge
    // confirmation look up, so the two probes return identical sets
    val e = s.range(0, 40).selectExpr("id AS u")
      .crossJoin(s.range(0, 40).selectExpr("id AS v"))
      .filter(col("u") < col("v"))
      .filter(expr("substr(md5(concat('tg|', u, '|', v)), 1, 1) < '6'"))
      .localCheckpoint(true)
    val batch = e.filter(expr("substr(md5(concat('tb|', u, '|', v)), 1, 1) < '2'"))
    val adjFull = e.selectExpr("u AS src", "v AS dst")
      .unionAll(e.selectExpr("v AS src", "u AS dst"))
    val deg = adjFull.groupBy(col("src")).agg(count(lit(1)).as("d"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val full = rows(operators.Graph.batchClosedTriangles(batch, adjFull, deg))
    val pruned = rows(operators.Graph.batchClosedTriangles(
      batch, operators.Graph.batchAdjOf(e, batch), deg))
    assert(full.nonEmpty, "vacuous: the synthetic graph closed no batch triangles")
    assert(full == pruned,
      s"prune dropped a candidate: first diff ${full.zip(pruned).find(p => p._1 != p._2)}")
  }

  test("sim_ivf_incremental: the planner picks the exact leg at gate-sf candidate volume") {
    val p = operators.Sim.incrCandCounts(s, dir)
      .agg(coalesce(sum(col("ncand")), lit(0L))).head().getLong(0)
    assert(p > 0, "vacuous: no candidates probed")
    assert(p <= operators.Sim.AdcPairCut,
      s"gate-sf volume $p crossed the ADC cut ${operators.Sim.AdcPairCut} — " +
        "RoundTenOpsSpec's shipped-query replay assumes the exact leg here")
    // and the shipped query's rows equal the forced-exact leg's rows
    val shipped = SparkEntry.queries("sim_ivf_incremental")(s, dir)
      .collect().map(_.toString).sorted.toSeq
    val exact = operators.Sim.ivfIncrementalWith(s, dir, Some(false))
      .collect().map(_.toString).sorted.toSeq
    assert(shipped == exact, "planner did not route to the exact leg")
  }
}
