package graft

import org.scalatest.funsuite.AnyFunSuite

/** The persisted-index lifecycle contract (the r10 verdict's top ask):
  * the frozen history artifacts the incremental family consumes
  * (minhash band index + content groups + doc membership, IVF
  * reps/members/centroids, the history LM, the gram vocabulary) can be
  * WRITTEN by one job (`graft.IndexBuild`) and READ BACK by a later
  * scoring session, with every consumer query row-identical to the
  * in-session build path. A tamper test proves the persisted path is
  * genuinely READ (not silently rebuilt): replacing one artifact with a
  * truncated copy must change the consumer's output.
  */
class IndexLifecycleSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf
  private val consumers = Seq("dedup_incremental", "sim_ivf_incremental",
    "sim_ivf_plan", "dedup_incr_plan",
    "text_lm_ppl_filter", "text_ngram_novelty", "pipeline_admission",
    // graph substrate consumers (round 14): the incremental pair reads
    // the history artifacts directly; triangles/local-clustering prove
    // the COMPOSED full substrate (hist artifact ∪ batch slice) feeds
    // the whole non-incremental family unchanged
    "graph_cc_incremental", "graph_triangle_incremental",
    "graph_triangles", "graph_local_clustering",
    // corpus-cache consumers (round 15): non-incremental dedup queries
    // whose whole-corpus shingle/posting/signature caches ride the
    // root's optional _corpus_cache panel — read-back must be
    // row-identical to the in-session derivation
    "dedup_minhash", "dedup_ngram_minhash", "dedup_simhash",
    "dedup_ngram_jaccard",
    // graph corpus-cache consumers (round 16): the LPA label table and
    // the composed full triangle set ride the panel — read-back must be
    // row-identical to the in-session derivation
    "graph_label_prop", "graph_modularity")

  private def rows(q: String): Seq[String] =
    SparkEntry.queries(q)(s, dir).collect().map(_.toString).sorted.toSeq

  test("persisted-index read-back path is row-identical to the in-session build path") {
    val root = java.nio.file.Files.createTempDirectory("graft-index").toString
    val inline = consumers.map(q => q -> rows(q)).toMap
    try {
      IndexStore.writeAll(s, dir, root)
      IndexStore.artifacts.foreach { case (name, _) =>
        assert(new java.io.File(s"$root/$name/_SUCCESS").exists(),
          s"artifact $name was not committed under $root")
      }
      IndexStore.use(Some(root))
      // writeAll populated the session cache under the same key@root
      // tags the serve below would hit, so without eviction the
      // corpus-cache pins would compare the in-session build to itself
      // (ADVICE r15). Evicting the root-tagged entries forces the serve
      // through the parquet read-back path this test exists to pin.
      Cached.evictKeySuffix(s"@$root")
      consumers.foreach { q =>
        assert(rows(q) == inline(q),
          s"$q drifted between the in-session and persisted-index paths")
      }
    } finally IndexStore.use(None)
  }

  test("a tampered corpus cache changes dedup_minhash — the panel is read, not rebuilt") {
    val root = java.nio.file.Files.createTempDirectory("graft-ccache-tamper").toString
    val inline = rows("dedup_minhash")
    try {
      IndexStore.writeAll(s, dir, root)
      // drop half the verified pair table: if the serve genuinely reads
      // the _corpus_cache panel (rather than hitting a session entry or
      // silently rebuilding), the reported pairs must change
      import org.apache.spark.sql.functions.col
      val pairs = s.read.parquet(s"$root/_corpus_cache/dedup_minhash_pairs")
      val tampered = pairs.filter(col("doc_a") % 2 === 0)
      assert(tampered.count() < pairs.count(), "vacuous: the tamper dropped no rows")
      tampered.write.mode("overwrite").parquet(s"$root/_corpus_cache/pairs_tampered")
      s.read.parquet(s"$root/_corpus_cache/pairs_tampered").write.mode("overwrite")
        .parquet(s"$root/_corpus_cache/dedup_minhash_pairs")
      Cached.evictKeySuffix(s"@$root")
      IndexStore.use(Some(root))
      assert(rows("dedup_minhash") != inline,
        "tampering _corpus_cache/dedup_minhash_pairs did not change dedup_minhash — " +
          "the corpus-cache panel is not being read")
    } finally {
      IndexStore.use(None)
      // the tampered frame must not leak into later suites via the
      // session cache
      Cached.evictKeySuffix(s"@$root")
    }
  }

  test("hermetic: scoring runs on a corpus with history rows PHYSICALLY ABSENT") {
    // the production claim, falsifiably: a cold scoring session touches
    // only the persisted index and tonight's batch. Stage a corpus dir
    // holding ONLY batch documents/embeddings (history rows deleted, not
    // filtered), point the consumers at artifacts built from the full
    // corpus, and require output identical to the full-corpus run — any
    // code path that still reads raw history data would crash or drift.
    import org.apache.spark.sql.functions.expr
    val isBatchDoc = "substr(md5(concat('incr|', cast(doc_id as string))), 1, 2) < '40'"
    val isBatchVec = "substr(md5(concat('incrv|', cast(vec_id as string))), 1, 2) < '40'"
    val root = java.nio.file.Files.createTempDirectory("graft-index-hermetic").toString
    val scratch = java.nio.file.Files.createTempDirectory("graft-batch-only").toString
    // the bipartite CC family splits by edge-row parity, so its hermetic
    // staging is the doc one exactly: only batch lineitem rows survive.
    // (the co-purchase family's edges are DERIVED from raw pairs, so its
    // hermetic analog is the tamper test below, not row deletion —
    // graph_cc_incremental is the only graph consumer runnable here)
    val isBatchCcRow = "substr(md5(concat('incrcc|', cast(l_orderkey as string), " +
      "'|', cast(l_partkey as string))), 1, 2) < '40'"
    // graph_triangle_incremental reads NOTHING raw with a root active
    // (history substrate + staged batch edges are all artifacts), so it
    // runs hermetic on a corpus whose lineitem holds only the CC
    // family's batch rows — any raw read would see garbage and drift
    val hermeticConsumers = Seq("dedup_incremental", "sim_ivf_incremental",
      "sim_ivf_plan", "dedup_incr_plan",
      "text_lm_ppl_filter", "text_ngram_novelty", "pipeline_admission",
      "graph_cc_incremental", "graph_triangle_incremental")
    val inline = hermeticConsumers.map(q => q -> rows(q)).toMap
    try {
      IndexStore.writeAll(s, dir, root)
      Tables(s, dir, "documents").filter(expr(isBatchDoc))
        .write.parquet(s"$scratch/documents.parquet")
      Tables(s, dir, "embeddings").filter(expr(isBatchVec))
        .write.parquet(s"$scratch/embeddings.parquet")
      Tables(s, dir, "lineitem").filter(expr(isBatchCcRow))
        .write.parquet(s"$scratch/lineitem.parquet")
      IndexStore.use(Some(root))
      hermeticConsumers.foreach { q =>
        val got = SparkEntry.queries(q)(s, scratch).collect().map(_.toString).sorted.toSeq
        assert(got == inline(q),
          s"$q on the batch-only corpus + persisted index drifted from the full-corpus run")
      }
    } finally IndexStore.use(None)
  }

  test("a tampered artifact changes the output — the persisted path is read, not rebuilt") {
    val root = java.nio.file.Files.createTempDirectory("graft-index-tamper").toString
    val inline = rows("text_lm_ppl_filter")
    try {
      IndexStore.writeAll(s, dir, root)
      // halve the history LM: every xent shifts, so ppl values (and very
      // likely buckets) must differ if — and only if — the artifact is
      // what the query actually consumes
      val lm = s.read.parquet(s"$root/lm_hist_counts")
      lm.filter(org.apache.spark.sql.functions.col("cw") % 2 === 0)
        .write.mode("overwrite").parquet(s"$root/lm_tampered")
      s.read.parquet(s"$root/lm_tampered").write.mode("overwrite")
        .parquet(s"$root/lm_hist_counts")
      IndexStore.use(Some(root))
      assert(rows("text_lm_ppl_filter") != inline,
        "tampering lm_hist_counts did not change text_lm_ppl_filter — " +
          "the persisted artifact is not being read")
    } finally IndexStore.use(None)
  }

  test("a tampered graph edge artifact changes the composed substrate — the graph index is read") {
    // the co-purchase family's hermetic ANALOG (its edges are derived
    // from raw pairs, so history rows can't be deleted): halving the
    // history edge artifact must change the incremental triangle
    // accounting — iff the serving session composes the graph from the
    // persisted artifact instead of silently re-deriving it
    val root = java.nio.file.Files.createTempDirectory("graft-index-gtamper").toString
    val inline = rows("graph_triangle_incremental")
    try {
      IndexStore.writeAll(s, dir, root)
      val he = s.read.parquet(s"$root/graph_hist_edges")
      he.filter(org.apache.spark.sql.functions.col("u") % 2 === 0)
        .write.mode("overwrite").parquet(s"$root/ge_tampered")
      s.read.parquet(s"$root/ge_tampered").write.mode("overwrite")
        .parquet(s"$root/graph_hist_edges")
      IndexStore.use(Some(root))
      assert(rows("graph_triangle_incremental") != inline,
        "tampering graph_hist_edges did not change graph_triangle_incremental — " +
          "the persisted graph substrate is not being read")
    } finally IndexStore.use(None)
  }
}
