package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecFunctions.vec_dot

/** Dev probe: recall-vs-nprobe curves for the three coarse-quantized ANN
  * index families (cosine-IVF over label cells, IVF-PQ with ADC rerank,
  * MIPS-IVF over norm-banded cells) on an arbitrary embeddings corpus.
  *
  * Usage: runMain graft.AnnProbe <dir> [nprobe,nprobe,...]
  *
  * The shipped sim_* queries pin one config each (nprobe 3 / 3 / 12);
  * this main sweeps the knob and reports, per (family, nprobe):
  * mean recall@5 over the 8 query vectors against the family's exact
  * brute-force truth, and the PROBED FRACTION — the share of corpus
  * vectors a query actually scores, the number that decides whether an
  * index earns its keep at 100 TB (BASELINE.md round-9 documented that
  * on a near-ISOTROPIC corpus no coarse quantizer probes sub-linearly
  * at high recall; round-10 pairs that with a genuinely CLUSTERED
  * corpus, where the same code probes a small fraction — the data
  * regime real embedding corpora live in).
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sweep = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
                else Seq(1, 2, 3, 4, 6, 8, 12, 16, 20)
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

    val e = operators.Sim.vectors(spark, dir)
    val n = e.count()
    val nCells = e.select(countDistinct(col("label"))).head().getLong(0)
    println(s"[annprobe] dir=$dir corpus=$n vectors, $nCells label cells")

    // ---- exact truths (once per family) -------------------------------
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id"), col("cand_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cosTruth = pairs(operators.Sim.bruteTopk(spark, dir))
    val mipsTruth = pairs(operators.Sim.mipsTopk(spark, dir))

    def recall(approx: DataFrame, truth: Set[(Long, Long)]): Double = {
      val hit = pairs(approx).count(truth.contains)
      hit.toDouble / truth.size
    }

    // ---- probed fraction ----------------------------------------------
    // cosine-IVF / IVF-PQ probe label cells ranked by centroid cosine
    def cosProbedFraction(nprobe: Int): Double = {
      val cent = operators.Sim.centroids(spark, dir)
      val sizes = e.groupBy(col("label").as("cell")).agg(count(lit(1)).as("cn_rows"))
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val probed = q.crossJoin(broadcast(cent))
        .withColumn("ccos", vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("crk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cell"))))
        .filter(col("crk") <= nprobe)
        .join(sizes, "cell")
        .agg(sum(col("cn_rows"))).head().getLong(0)
      probed.toDouble / (8.0 * n)
    }
    // MIPS probes norm-banded cells of the AUGMENTED corpus by centroid IP
    def mipsProbedFraction(nprobe: Int): Double = {
      val base = e.select(col("vec_id"), col("label"), col("v"))
      val aug = base.unionAll(base.filter(col("vec_id") % 100 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"), col("label"),
            expr("transform(v, x -> x * 2.0d)").as("v")))
        .withColumn("n2", vec_dot(col("v"), col("v")))
      val m2 = aug.agg(max(col("n2")).as("m2"))
      val ax = aug.crossJoin(broadcast(m2))
        .withColumn("va", expr("concat(v, array(sqrt(m2 - n2)))"))
        .withColumn("cell0",
          col("label") * 2 + when(col("n2") * 2 > col("m2"), 1L).otherwise(0L))
        .localCheckpoint(true)
      val na = ax.count()
      val cent = ax.select(col("cell0"), posexplode(col("va")))
        .groupBy("cell0", "pos")
        .agg(((min(col("col")) + max(col("col"))) / 2).as("cx"))
        .groupBy("cell0")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cx))), p -> p.cx)").as("cv"))
        .select(col("cell0").as("cell"), col("cv"))
      val sizes = ax.groupBy(col("cell0").as("cell")).agg(count(lit(1)).as("cn_rows"))
      val q = aug.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), expr("concat(v, array(0.0d))").as("qa"))
      val probed = q.crossJoin(broadcast(cent))
        .withColumn("ub", vec_dot(col("qa"), col("cv")))
        .withColumn("crk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("ub").desc, col("cell"))))
        .filter(col("crk") <= nprobe)
        .join(sizes, "cell")
        .agg(sum(col("cn_rows"))).head().getLong(0)
      probed.toDouble / (8.0 * na)
    }

    // corpus-scaled IVF (ncells = ⌊√n⌋, hash-seeded 2-round Lloyd cells):
    // the family whose probed fraction SHRINKS as the corpus grows —
    // sweep two corpus sizes to see nprobe/ncells fall at held recall
    def scaledProbedFraction(nprobe: Int): Double = {
      val cent = operators.Sim.scaledCents(spark, dir)
      val sizes = operators.Sim.scaledAssign(spark, dir)
        .groupBy("cell").agg(count(lit(1)).as("cn_rows"))
      val q = operators.Sim.scaledX(spark, dir).filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("x").as("qx"), col("xn").as("qxn"))
      val probed = q.crossJoin(broadcast(cent))
        .withColumn("ccos", vec_dot(col("qx"), col("cv")) / (col("qxn") * col("cn")))
        .withColumn("crk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cell"))))
        .filter(col("crk") <= nprobe)
        .join(sizes, "cell")
        .agg(sum(col("cn_rows"))).head().getLong(0)
      probed.toDouble / (8.0 * n)
    }
    println(s"[annprobe] scaled ncells=${operators.Sim.scaledNcells(spark, dir)}")

    // ---- the sweep ------------------------------------------------------
    for (np <- sweep) {
      val rIvf = recall(operators.Sim.ivfTopkAt(spark, dir, np), cosTruth)
      val rPq = recall(operators.Sim.ivfpqTopkAt(spark, dir, np), cosTruth)
      val reorder = sys.env.getOrElse("SPARK_GRAFT_REORDER", "64").toInt
      val nCodes = sys.env.getOrElse("SPARK_GRAFT_NCODES", "16").toInt
      val trainR = sys.env.getOrElse("SPARK_GRAFT_TRAIN", "0").toInt
      val rPqRes = recall(
        operators.Sim.ivfpqResTopkAt(spark, dir, np, reorder, nCodes, trainR), cosTruth)
      val fCos = cosProbedFraction(np)
      val rMips = recall(operators.Sim.mipsIvfAt(spark, dir, np), mipsTruth)
      val fMips = mipsProbedFraction(np)
      val rScaled = recall(operators.Sim.scaledIvfAt(spark, dir, np), cosTruth)
      val fScaled = scaledProbedFraction(np)
      println(f"[annprobe] nprobe=$np%2d  ivf_recall=$rIvf%.3f ivfpq_recall=$rPq%.3f ivfpq_res_recall=$rPqRes%.3f probed=$fCos%.3f | mips_recall=$rMips%.3f mips_probed=$fMips%.3f | scaled_recall=$rScaled%.3f scaled_probed=$fScaled%.4f")
    }
    spark.stop()
  }
}
