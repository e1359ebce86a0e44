package graft

import org.apache.spark.sql.SparkSession

/** Scale probe for the production incremental ANN gate
  * (`sim_ivf_incremental` on the frozen ⌊√n_hist⌋-cell quantizer):
  * prints history/batch sizes, the measured cell count, and the number
  * of (batch rep × history rep) candidate pairs the serving query
  * actually scores — the evidence behind BASELINE.md round-12's
  * candidate-volume claims. Run it on two corpus sizes to see
  * pairs-per-batch-rep grow as nprobe·√n_hist (a SHRINKING fraction of
  * history), and at two `GRAFT_BATCH_THRESH` shares to see total pairs
  * track the batch. Usage: `runMain graft.IvfIncrProbe <dir>`.
  */
object IvfIncrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // keep TypedImperativeAggregate group-bys (TopKByValue — the ADC
      // candidate cut, topk_per_group) on the HASH path: the default
      // 128-key fallback degrades a pair-count-sized heap-agg input to a
      // full in-partition sort spill; 64 k keys x ~1.2 KB heap state is
      // ~80 MB/task, safe on this box and far above real group counts
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val stats = operators.Sim.incrProbeStats(spark, dir)
    val sec = (System.nanoTime() - t0) / 1e9
    val m = stats.toMap
    val perRep = m("scored_pairs").toDouble / math.max(1L, m("batch_reps"))
    val frac = perRep / math.max(1L, m("hist_reps"))
    val kv = stats.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(f"""{"metric":"ivf_incr_probe",$kv,"pairs_per_batch_rep":$perRep%.1f,"hist_frac_scored":$frac%.4f,"thresh":"${Incr.batchThresh}","sec":$sec%.2f,"dir":"$dir"}""")
    spark.stop()
  }
}
