package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: pointer-doubling CC on a synthetic N-node PATH graph —
  * the adversarial diameter shape. Usage: runMain graft.PathProbe [n].
  * Reports PRODUCTIVE rounds (last round that changed a label — the
  * trailing no-change verification round is excluded) and wall time;
  * hash-min would need N rounds.
  */
object PathProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fwd = spark.range(n - 1).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val adj = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(cpus.toInt, col("src"))
      .persist()
    adj.count()
    val t0 = System.nanoTime()
    val (lbl, rounds) = operators.Graph.pointerDoubleLabelsWithRounds(adj, 64)
    val bad = lbl.filter(col("lbl") =!= 0L).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[pathprobe] n=$n rounds=$rounds nonzero_labels=$bad time=$secs%.2f s")
    spark.stop()
  }
}
