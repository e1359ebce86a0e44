package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pins: the incremental-dedup artifact-read planner
  * (`dedup_incr_plan`, the r15 verdict's ask #4 — the sim_ivf_plan
  * discipline applied to the survivor semi-join prune).
  *
  *  - The prune is a SUPERSET filter (history contents sharing ≥ 1 band
  *    with a batch content), so the pruned and full legs verify the
  *    same candidates and must return identical rows — the planner is a
  *    pure performance choice. Pinned on both legs FORCED.
  *  - The decision flips on the configured cut alone (the group-share
  *    stat straddles any cut placed on either side of it), and the
  *    dumped oracle SQL re-interpolates the configured value.
  *  - With an index root active, the shipped query routes to the leg
  *    the plan row publishes.
  */
class RoundSixteenOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf
  private val Knob = "graft.dedup.prune.cut.pct"

  private def withCut[A](cut: Long)(body: => A): A = {
    val prev = sys.props.get(Knob)
    sys.props(Knob) = cut.toString
    try body
    finally prev match {
      case Some(v) => sys.props(Knob) = v
      case None => sys.props.remove(Knob)
    }
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("writeAll rebuilds in place over an existing corpus-cache panel (the IndexBuild rerun path)") {
    // r15 ADVICE: rebuilding into a root that already holds a
    // _corpus_cache panel from the same corpus made each cache build
    // resolve THROUGH corpusCached to a read of the very parquet it was
    // about to overwrite — Spark's read-your-own-overwrite failure.
    // The `building` guard + _src poisoning fix it; this pins the rerun
    // end to end: second writeAll succeeds, the panel re-validates, and
    // a panel consumer still serves the in-session rows.
    val root = java.nio.file.Files.createTempDirectory("graft-rebuild").toString
    val inline = SparkEntry.queries("dedup_minhash")(s, dir)
      .collect().map(_.toString).sorted.toSeq
    try {
      IndexStore.writeAll(s, dir, root)
      IndexStore.writeAll(s, dir, root) // the rerun that used to crash
      val src = s.read.parquet(s"$root/_corpus_cache/_src").head().getString(0)
      assert(src == dir, s"rebuild left the panel validated for '$src', not '$dir'")
      IndexStore.use(Some(root))
      Cached.evictKeySuffix(s"@$root")
      val served = SparkEntry.queries("dedup_minhash")(s, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(served == inline, "post-rebuild panel read-back drifted")
    } finally IndexStore.use(None)
  }

  test("dedup_incremental: pruned and full artifact-read legs return identical rows") {
    val pruned = rows(operators.Dedup.incrementalWith(s, dir, Some(true)))
    val full = rows(operators.Dedup.incrementalWith(s, dir, Some(false)))
    assert(full.nonEmpty, "vacuous: the gate corpus produced no incremental pairs")
    assert(pruned == full,
      s"the survivor semi-join prune dropped a candidate: first diff ${
        pruned.zip(full).find(p => p._1 != p._2)}")
  }

  test("dedup_incr_plan flips on the configured cut alone; the shipped query routes to the planned leg") {
    def planRow(): (Long, Long, Long, String) = {
      val r = SparkEntry.queries("dedup_incr_plan")(s, dir)
        .select(col("n_batch_groups"), col("n_hist_groups"),
          col("prune_cut_pct"), col("leg")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
    }
    val (nb, nh, _, _) = planRow()
    assert(nb > 0 && nh > 0, s"vacuous: degenerate group counts ($nb, $nh)")
    // pruned iff nb*100 < cut*nh: floor(nb*100/nh) lands on the full
    // side, floor+1 on the pruned side — the stat straddles both cuts
    val cutFull = nb * 100 / nh
    val cutPruned = cutFull + 1
    withCut(cutPruned) {
      val (_, _, cut, leg) = planRow()
      assert(cut == cutPruned && leg == "pruned",
        s"cut $cutPruned above the share must select pruned, got ($cut, $leg)")
      assert(SparkEntry.oracleSql("dedup_incr_plan").contains(s"CAST($cutPruned AS BIGINT)"),
        "oracle SQL did not re-interpolate the configured cut")
    }
    withCut(cutFull) {
      val (_, _, cut, leg) = planRow()
      assert(cut == cutFull && leg == "full",
        s"cut $cutFull at/below the share must select full, got ($cut, $leg)")
    }
    // with a root active the serving query consults the same planner;
    // both routes must serve the identical (prune-lossless) rows
    val root = java.nio.file.Files.createTempDirectory("graft-dedup-plan").toString
    try {
      IndexStore.writeAll(s, dir, root)
      IndexStore.use(Some(root))
      Cached.evictKeySuffix(s"@$root")
      val served = withCut(cutPruned) {
        rows(SparkEntry.queries("dedup_incremental")(s, dir))
      }
      val servedFull = withCut(cutFull) {
        rows(SparkEntry.queries("dedup_incremental")(s, dir))
      }
      val ref = rows(operators.Dedup.incrementalWith(s, dir, Some(false)))
      assert(served == ref && servedFull == ref,
        "the planner-routed serve drifted from the forced-leg reference")
    } finally IndexStore.use(None)
  }
}
