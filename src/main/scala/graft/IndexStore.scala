package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** On-disk lifecycle for the frozen-index artifacts behind the
  * incremental family (`dedup_incremental`, `sim_ivf_incremental`,
  * `text_lm_ppl_filter`, `text_ngram_novelty`, `pipeline_admission`).
  *
  * Session caches ([[Cached]]) give those queries the right SEMANTICS —
  * the history side is computed once per session and never varies with
  * the batch — but the production nightly gate reads an index a PRIOR
  * JOB wrote to storage: the scoring session must never recompute
  * history signatures/norms/counts from raw text or vectors. This
  * object is that contract:
  *
  *  - [[IndexBuild]] (a main) runs each registered builder against a
  *    corpus and writes one parquet directory per artifact under a
  *    single index root — the nightly index-build job.
  *  - [[loadOrBuild]] is what the incremental queries' history accessors
  *    call: when an index root is configured (the `GRAFT_INDEX_DIR` env
  *    var, or [[use]] from tests/probes) and the artifact exists there,
  *    the accessor READS it; otherwise it falls back to the in-session
  *    build. The driver's Verify/Bench runs configure nothing, so their
  *    plans and results are unchanged.
  *
  * Every artifact is bit-deterministic (md5/xxhash64 keys, exact
  * integer counts, IEEE doubles — all of which parquet round-trips
  * exactly) and consumers treat it as an unordered relation, so the
  * persisted path is row-identical to the in-session path;
  * IndexLifecycleSpec pins that equality per consumer query, and
  * `graft.IndexProbe` measures the cold-session read-back (a scoring
  * session that builds nothing vs one that rebuilds history).
  */
/** The md5-parity history/batch split shared by the whole incremental
  * family. The shipped queries and their oracles pin the '40' prefix
  * (≈ 25% batch share); `GRAFT_BATCH_THRESH` overrides it for SCALE
  * PROBES ONLY (e.g. '08' ≈ 3% — the production nightly share), so the
  * candidate-volume-∝-batch claim can be measured at two shares on one
  * corpus (BASELINE.md round-11). Verify runs never set it: the DuckDB
  * oracles embed '40' literally.
  */
object Incr {
  val batchThresh: String = sys.env.getOrElse("GRAFT_BATCH_THRESH", "40")
  val isBatchDoc: String =
    s"substr(md5(concat('incr|', cast(doc_id as string))), 1, 2) < '$batchThresh'"
  val isBatchVec: String =
    s"substr(md5(concat('incrv|', cast(vec_id as string))), 1, 2) < '$batchThresh'"
}

object IndexStore {
  @volatile private var rootOverride: Option[String] = None

  /** The active index root: an explicit [[use]] override (tests, probes,
    * [[IndexBuild]]) or the `GRAFT_INDEX_DIR` environment variable.
    */
  def active: Option[String] = rootOverride.orElse(sys.env.get("GRAFT_INDEX_DIR"))

  /** Point in-process consumers at a persisted index root (None reverts
    * to the environment). Spec/probe plumbing — a production job gets
    * the root from its environment.
    */
  def use(path: Option[String]): Unit = { rootOverride = path }

  /** Cache-key suffix so a persisted-path frame never collides with the
    * in-session build inside one session's [[Cached]] map (the
    * lifecycle spec runs both paths in one JVM).
    */
  def tag: String = active.fold("")(r => s"@$r")

  /** Read artifact `name` from the active root when it exists there,
    * else run the in-session build.
    */
  def loadOrBuild(s: SparkSession, name: String)(build: => DataFrame): DataFrame =
    active match {
      case Some(r) if written(r, name) => s.read.parquet(s"$r/$name")
      case _ => build
    }

  /** An artifact is readable once its job committed (_SUCCESS marker —
    * the standard Hadoop commit protocol signal, so a crashed build is
    * never half-read).
    */
  private def written(r: String, name: String): Boolean =
    new java.io.File(s"$r/$name/_SUCCESS").exists()

  /** Registered artifact builders in WRITE ORDER (later artifacts may
    * derive from earlier ones — e.g. the band index from the content
    * groups — mirroring the production build DAG).
    */
  def artifacts: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "dedup_hist_groups" -> operators.Dedup.buildHistGroups _,
    "dedup_hist_bands" -> operators.Dedup.buildHistBands _,
    "dedup_hist_docs" -> operators.Dedup.buildHistDocs _,
    "ivf_hist_centroids" -> operators.Sim.buildIvfHistCentroids _,
    "ivf_hist_reps" -> operators.Sim.buildIvfHistReps _,
    "ivf_hist_members" -> operators.Sim.buildIvfHistMembers _,
    "lm_hist_counts" -> operators.Train.buildLmHistCounts _,
    "gram_hist_vocab" -> operators.Text.buildGramHistVocab _,
  )

  /** Build every artifact from `sfDir` and write it under `root` —
    * shared by the [[IndexBuild]] main and the lifecycle spec.
    */
  def writeAll(s: SparkSession, sfDir: String, root: String): Unit =
    artifacts.foreach { case (name, build) =>
      build(s, sfDir).write.mode("overwrite").parquet(s"$root/$name")
    }

  /** The nightly index UPDATE: fold tonight's batch into the artifacts
    * under `histRoot` and write the updated index under `outRoot` —
    * raw history text/vectors are never read (every merge is set
    * algebra over the artifacts plus batch-derived increments; the
    * centroid artifact carries the per-dimension extremes precisely so
    * its midranges stay mergeable). IndexMergeSpec pins every merged
    * artifact row-identical to a from-scratch full-corpus build.
    */
  def mergeAll(s: SparkSession, sfDir: String, histRoot: String, outRoot: String): Unit = {
    val merged = operators.Dedup.mergedArtifacts(s, sfDir, histRoot) ++
      operators.Sim.mergedArtifacts(s, sfDir, histRoot) ++
      operators.Train.mergedArtifacts(s, sfDir, histRoot) ++
      operators.Text.mergedArtifacts(s, sfDir, histRoot)
    artifacts.foreach { case (name, _) =>
      merged(name).write.mode("overwrite").parquet(s"$outRoot/$name")
    }
  }
}

/** The nightly index-update job: `IndexUpdate <sfDir> <histRoot>
  * <outRoot>` folds the corpus' batch split into the persisted index at
  * `histRoot` and writes the updated artifacts to `outRoot` — tonight's
  * admitted batch becomes tomorrow's history without a full rebuild.
  */
object IndexUpdate {
  def main(args: Array[String]): Unit = {
    val (sfDir, histRoot, outRoot) = (args(0), args(1), args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    IndexStore.mergeAll(spark, sfDir, histRoot, outRoot)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"index_update","value":$sec%.2f,"unit":"sec","artifacts":${IndexStore.artifacts.size},"hist":"$histRoot","out":"$outRoot","sf":"$sfDir"}""")
    spark.stop()
  }
}

/** The nightly index-build job: `IndexBuild <sfDir> <indexRoot>` writes
  * every frozen-index artifact as parquet. A later scoring session (any
  * main run with `GRAFT_INDEX_DIR=<indexRoot>`) then reads the
  * artifacts instead of rebuilding history — see [[IndexStore]].
  */
object IndexBuild {
  def main(args: Array[String]): Unit = {
    val (sfDir, root) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    IndexStore.writeAll(spark, sfDir, root)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"index_build","value":$sec%.2f,"unit":"sec","artifacts":${IndexStore.artifacts.size},"root":"$root","sf":"$sfDir"}""")
    spark.stop()
  }
}
