package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-16 OPTIMIZATION pins. The round changed operator INTERNALS only
  * (shared substrates + plan shapes); each test pins that a substrate
  * equals the inline computation it replaced, or that the consumers of a
  * newly shared cache still agree with each other.
  */
class RoundSixteenPerfSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("pairSharedCounts IS the rare-posting pair aggregation filtered to the union " +
    "of both consumers' thresholds (J >= 0.6 or max-containment >= 0.9)") {
    val got = operators.Dedup.pairSharedCounts(s, dir)
      .orderBy("ka", "kb").collect().map(_.toSeq)
    val exf = operators.Dedup.postings(s, dir).withColumn("ck", expr("xxhash64(ckey)"))
    val want = exf.as("a").join(exf.as("b"),
        col("a.s") === col("b.s") && col("a.ck") < col("b.ck"))
      .groupBy(col("a.ck").as("ka"), col("b.ck").as("kb"))
      .agg(count(lit(1)).as("shared"), first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .filter(
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")) >= 0.6 ||
          greatest(col("shared").cast("double") / col("na"),
            col("shared").cast("double") / col("nb")) >= 0.9)
      .orderBy("ka", "kb").collect().map(_.toSeq)
    assert(got.nonEmpty, "pair substrate must be non-empty on the suite corpus")
    assert(got.toSeq == want.toSeq)
    // and the union filter loses neither consumer a row: every reported
    // pair of both queries is derivable from the substrate
    val nJ = SparkEntry.queries("dedup_ngram_jaccard")(s, dir).count()
    val nC = SparkEntry.queries("dedup_containment")(s, dir).count()
    assert(nJ > 0 && nC > 0, "consumers must stay non-vacuous on the suite corpus")
  }

  test("groupRareCounts matches the inline per-content rare counts") {
    val got = operators.Dedup.groupRareCounts(s, dir)
      .orderBy("ckey").collect().map(_.toSeq)
    val want = operators.Dedup.postings(s, dir).groupBy("ckey")
      .agg(count(lit(1)).as("sr"), first(col("n")).as("n"))
      .orderBy("ckey").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("mm frame-substrate consumers agree: shot_boundary and align_stub " +
    "energies equal audio_energy's at the same (doc, frame)") {
    val ae = SparkEntry.queries("mm_audio_energy")(s, dir)
      .select("doc_id", "frame_idx", "energy")
    val sb = SparkEntry.queries("mm_shot_boundary")(s, dir)
      .select(col("doc_id"), col("frame_idx"), col("energy").as("e2"))
    val sbDiff = ae.join(sb, Seq("doc_id", "frame_idx"))
      .filter(col("energy") =!= col("e2")).count()
    assert(sbDiff == 0, "shot_boundary energy drifted from audio_energy")
    val al = SparkEntry.queries("mm_align_stub")(s, dir)
      .select(col("doc_id"), col("frame_idx"), col("energy").as("e3")).distinct()
    val alDiff = ae.join(al, Seq("doc_id", "frame_idx"))
      .filter(col("energy") =!= col("e3")).count()
    assert(alDiff == 0, "align_stub energy drifted from audio_energy")
  }

  test("mm_phash window-count form: every row's n_same equals its phash group size") {
    val rows = SparkEntry.queries("mm_phash")(s, dir)
      .select("doc_id", "phash", "n_same").collect()
    val sizes = rows.groupBy(_.getAs[Long]("phash")).map { case (k, v) => k -> v.length }
    assert(rows.forall(r => sizes(r.getAs[Long]("phash")) == r.getAs[Long]("n_same")),
      "n_same must be the group size under the window-count formulation")
  }
}
