package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16: `AdcPairCut` is config-derived (r15 verdict ask #2 — the
  * ADC-vs-exact crossover moves with memory bandwidth and shuffle
  * throughput, so a real cluster must be able to set its own measured
  * value without a rebuild). This spec drives BOTH scoring legs through
  * the knob alone, on the gate corpus, whose candidate volume straddles
  * any cut we place on either side of it:
  *
  *  - cut below the measured volume → the planner (and the shipped
  *    `sim_ivf_incremental`) routes to the ADC leg;
  *  - cut above it → the exact leg;
  *  - `sim_ivf_plan` publishes the configured cut and the flipped leg;
  *  - the dumped oracle SQL interpolates the SAME configured value, so
  *    the DuckDB replay always judges the decision actually in force.
  */
class ConfigCutSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf
  private val Knob = "graft.adc.pair.cut"

  private def withCut[A](cut: Long)(body: => A): A =
    TestSpark.withProp(Knob, cut.toString)(body)

  test("the planner leg flips on the configured cut alone, and the oracle interpolates it") {
    val p = operators.Sim.incrCandCounts(s, dir)
      .agg(coalesce(sum(col("ncand")), lit(0L))).head().getLong(0)
    assert(p > 1, s"vacuous: candidate volume $p leaves no room to straddle")

    def planRow(): (Long, String) = {
      val r = SparkEntry.queries("sim_ivf_plan")(s, dir)
        .select(col("adc_cut"), col("leg")).head()
      (r.getLong(0), r.getString(1))
    }
    val (lowCut, highCut) = (p - 1, p + 1)

    withCut(lowCut) {
      val (cut, leg) = planRow()
      assert(cut == lowCut && leg == "adc",
        s"cut $lowCut below volume $p must select adc, got ($cut, $leg)")
      assert(SparkEntry.oracleSql("sim_ivf_plan").contains(lowCut.toString),
        "oracle SQL did not re-interpolate the configured cut")
      // the shipped query routes to the planned (ADC) leg
      val shipped = SparkEntry.queries("sim_ivf_incremental")(s, dir)
        .collect().map(_.toString).sorted.toSeq
      val adc = operators.Sim.ivfIncrementalWith(s, dir, Some(true))
        .collect().map(_.toString).sorted.toSeq
      assert(shipped == adc, "planner did not route to the ADC leg under a binding low cut")
    }
    withCut(highCut) {
      val (cut, leg) = planRow()
      assert(cut == highCut && leg == "exact",
        s"cut $highCut above volume $p must select exact, got ($cut, $leg)")
      assert(SparkEntry.oracleSql("sim_ivf_plan").contains(highCut.toString),
        "oracle SQL did not re-interpolate the configured cut")
      val shipped = SparkEntry.queries("sim_ivf_incremental")(s, dir)
        .collect().map(_.toString).sorted.toSeq
      val exact = operators.Sim.ivfIncrementalWith(s, dir, Some(false))
        .collect().map(_.toString).sorted.toSeq
      assert(shipped == exact, "planner did not route to the exact leg under a high cut")
    }
    // the default is the measured local[32] crossover; unset ≡ default
    assert(operators.Sim.AdcPairCut == operators.Sim.AdcPairCutDefault,
      "knob removal must restore the measured default")
  }
}
