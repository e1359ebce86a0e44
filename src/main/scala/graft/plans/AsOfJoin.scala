/** Native as-of join: custom logical node + SparkStrategy + physical
  * merge operator.
  *
  * Reference capability: the reference has no joins at all (absence
  * documented in SURVEY.md §2.1); the as-of join is part of the
  * engine-grade extension set. The window-emulated variant ships as
  * `join_asof` (operators/Udf.scala); this file is the same semantics as
  * a first-class physical operator — the (c) rung of the custom-operator
  * ladder (Expression → Rule → TypedImperativeAggregate → LogicalPlan +
  * Strategy + SparkPlan).
  *
  * Semantics: for each left row, the LAST right row of the same key with
  * rightTime <= leftTime, ties on rightTime resolved by the highest
  * tie-break value; right payload columns come back null when no such
  * row exists (LEFT OUTER as-of).
  *
  * Scale design: `requiredChildDistribution` clusters both sides by key
  * and `requiredChildOrdering` sorts (key, time) — EnsureRequirements
  * inserts exactly the exchanges/sorts a sort-merge join would get, then
  * each partition pair is merged in ONE streaming pass holding a single
  * buffered right row + one remembered match per key: O(1) memory, no
  * union materialization, no window state. At 100 TB this is the same
  * shuffle cost as SMJ with strictly less per-partition work than the
  * window emulation.
  *
  * The package lives under org.apache.spark.sql to reach the
  * private[sql] `classic.Dataset.ofRows` bridge — same pattern as
  * VecExpressions.scala; works on any driver-owned session via
  * `spark.experimental.extraStrategies` (and cluster-wide via
  * [[GraftExtensions]]).
  */
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical as-of join. Children are pre-projected so that join columns
  * are plain attributes: left exposes (leftKey, leftTime, ...), right
  * exposes (rightKey, rightTime, rightTie, payload...).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightTie: Attribute,
    payload: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Physical streaming merge. Both inputs arrive clustered by key and
  * sorted by (key, time [, tie]); one pass per partition.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightTie: Attribute,
    payload: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTimeB = BindReferences.bindReference(leftTime: Expression, left.output)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTimeB = BindReferences.bindReference(rightTime: Expression, right.output)
    val payloadExprs = payload
    val rOut = right.output
    val lOut = left.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullPayload = InternalRow.fromSeq(Seq.fill(payloadExprs.size)(null))
      val rBuf = rIt.buffered

      // last right payload seen for the current key, valid while the
      // left cursor stays on that key
      var matchKey: Long = 0L
      var matchRow: InternalRow = null

      lIt.map { lRow =>
        val keyIsNull = lKeyB.eval(lRow) == null || lTimeB.eval(lRow) == null
        if (!keyIsNull) {
          val lk = lKeyB.eval(lRow).asInstanceOf[Long]
          val lt = lTimeB.eval(lRow).asInstanceOf[Long]
          // advance the right cursor through every row at or before
          // (lk, lt); remember the last one with the matching key
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val rkv = rKeyB.eval(head)
            val rtv = rTimeB.eval(head)
            if (rkv == null || rtv == null) { rBuf.next() } // skip null keys
            else {
              val rk = rkv.asInstanceOf[Long]
              val rt = rtv.asInstanceOf[Long]
              if (rk < lk || (rk == lk && rt <= lt)) {
                val r = rBuf.next()
                if (rk == lk) { matchKey = lk; matchRow = payloadProj(r).copy() }
              } else advance = false
            }
          }
          val p = if (matchRow != null && matchKey == lk) matchRow else nullPayload
          resultProj(joined(lRow, p))
        } else resultProj(joined(lRow, nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one-to-one translation of the logical node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, tie, pay) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie, pay) :: Nil
    case _ => Nil
  }
}

/** Public constructor: resolves join columns by name, registers the
  * strategy on the session, and returns the joined DataFrame.
  */
object AsOfJoin {
  def apply(
      leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String, rightTie: String,
      payloadCols: Seq[String]): DataFrame = {
    val spark = leftDf.sparkSession.asInstanceOf[ClassicSession]
    // GraftExtensions already injects the strategy for sessions built with
    // the extension; this covers plain sessions. Registration mutates
    // session-global state, so check-then-act must be atomic.
    AsOfJoinStrategy.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    // the physical merge reads keys/times/tie as raw longs — fail fast at
    // resolution time rather than ClassCastException inside executors
    def longBacked(a: Attribute): Attribute = a.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => a
      case other => throw new IllegalArgumentException(
        s"as-of join column ${a.name} must be bigint/timestamp-backed, got $other")
    }
    Dataset.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan,
      longBacked(attr(lPlan, leftKey)), longBacked(attr(lPlan, leftTime)),
      longBacked(attr(rPlan, rightKey)), longBacked(attr(rPlan, rightTime)),
      longBacked(attr(rPlan, rightTie)),
      payloadCols.map(attr(rPlan, _))))
  }
}
