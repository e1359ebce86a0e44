package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** The nightly index UPDATE contract: folding tonight's batch into the
  * persisted history artifacts (`IndexStore.mergeAll` — set algebra
  * over artifacts + batch increments, raw history never read) must
  * produce, artifact for artifact, EXACTLY what a from-scratch build
  * over the full corpus produces. This is the property that lets the
  * admitted batch become tomorrow's history without a rebuild.
  */
class IndexMergeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("merged artifacts equal a from-scratch full-corpus build, artifact for artifact") {
    val rootA = java.nio.file.Files.createTempDirectory("graft-merge-hist").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft-merge-out").toString
    IndexStore.writeAll(s, dir, rootA)
    IndexStore.mergeAll(s, dir, rootA, rootB)
    val fullGroups = operators.Dedup.groupsFor(s, dir, lit(true))
    val allVecs = operators.Sim.vectors(s, dir)
    val fullReps = operators.Sim.repsForVectors(allVecs)
    val full: Map[String, DataFrame] = Map(
      "dedup_hist_groups" -> fullGroups,
      "dedup_hist_bands" -> operators.Dedup.bandsForGroups(fullGroups),
      "dedup_hist_docs" -> operators.Dedup.docsFor(s, dir, lit(true)),
      "ivf_hist_reps" -> fullReps,
      "ivf_hist_members" -> operators.Sim.membersForVectors(allVecs, fullReps),
      "ivf_hist_centroids" -> operators.Sim.centroidsForVectors(allVecs),
      "lm_hist_counts" -> operators.Train.lmCountsFor(s, dir, lit(true)),
      "gram_hist_vocab" -> operators.Text.gramVocabFor(s, dir, lit(true)),
    )
    IndexStore.artifacts.foreach { case (name, _) =>
      val got = rows(s.read.parquet(s"$rootB/$name"))
      val want = rows(full(name))
      assert(got.size == want.size, s"$name: merged ${got.size} rows vs rebuilt ${want.size}")
      assert(got == want, s"$name drifted between merge and full rebuild: " +
        s"first diff ${got.zip(want).find(p => p._1 != p._2)}")
    }
    // and the merge genuinely ADDED the batch: every artifact at least
    // as large as history's, and the doc membership strictly larger
    val histDocs = rows(s.read.parquet(s"$rootA/dedup_hist_docs"))
    val mergedDocs = rows(s.read.parquet(s"$rootB/dedup_hist_docs"))
    assert(mergedDocs.size > histDocs.size, "vacuous merge: no batch docs folded in")
  }
}
