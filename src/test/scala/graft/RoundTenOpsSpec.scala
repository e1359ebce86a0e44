package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-10 batch — properties the DuckDB
  * hash gate cannot see. Headliners: incremental dedup must equal the
  * whole-corpus pair set restricted to batch-touching pairs (the
  * split-invariance that makes a frozen history index sound), and the
  * k-means loop must genuinely reach its movement fixpoint inside the
  * round cap (otherwise "converge" is just "iterate").
  */
class RoundTenOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("dedup_incremental equals the whole-corpus minhash pairs restricted to batch docs") {
    // signatures are content-determined, so the history/batch split must
    // not change WHICH pairs verify — only which are reported. Rebuild
    // the restriction from dedup_minhash's output and compare exactly.
    val isBatch = (id: Long) => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"incr|$id".getBytes("UTF-8"))
      f"${md(0)}%02x" < "40"
    }
    val full = SparkEntry.queries("dedup_minhash")(s, dir)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = full.flatMap { case (a, b, j) =>
      (isBatch(a), isBatch(b)) match {
        case (true, true)   => Some((a, b, j, "batch"))
        case (true, false)  => Some((a, b, j, "history"))
        case (false, true)  => Some((b, a, j, "history"))
        case (false, false) => None
      }
    }.toSet
    val got = SparkEntry.queries("dedup_incremental")(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(got == expected,
      s"incremental drifted from the restricted full-corpus set: " +
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(expected.nonEmpty, "vacuous restriction — no batch-touching pairs at this sf")
  }

  test("dedup_incremental: every reported pair leads with a genuine batch doc") {
    val rows = SparkEntry.queries("dedup_incremental")(s, dir).collect()
    val md = (id: Long) => java.security.MessageDigest.getInstance("MD5")
      .digest(s"incr|$id".getBytes("UTF-8"))
    rows.foreach { r =>
      val (bd, mdoc, src) = (r.getLong(0), r.getLong(1), r.getString(3))
      assert(f"${md(bd)(0)}%02x" < "40", s"batch_doc $bd is not a batch doc")
      val matchIsBatch = f"${md(mdoc)(0)}%02x" < "40"
      assert(matchIsBatch == (src == "batch"),
        s"match_src $src disagrees with the split for match_doc $mdoc")
    }
  }

  test("emb_kmeans_converge stops at the movement threshold inside the 6-round cap") {
    val (out, stopRound, met) = operators.Sim.kmeansConvergeDetail(s, dir)
    assert(met,
      s"movement never fell to 2% within $stopRound rounds — the threshold " +
        "stopping rule degenerated to the cap on this corpus")
    assert(stopRound <= 6)
    // the reported stop_round column must agree with the loop observable
    val reported = out.select("stop_round").distinct().collect().map(_.getLong(0))
    assert(reported.toSeq == Seq(stopRound.toLong))
    // centroid-count invariance: Lloyd may empty a cell in general, but
    // on this corpus the 10 label-seeded cells must all survive — a
    // collapse would silently change the index geometry every ANN query
    // shares (the rejected collapsing-Lloyd quantizer, BASELINE.md r9)
    val cells = out.select("cell_first").distinct().count()
    val finalCells = out.select("cell_final").distinct().count()
    assert(cells == finalCells,
      s"centroid count drifted: $cells initial cells, $finalCells after convergence")
  }

  test("emb_centroid_drift flags exactly the injected label-0 encoder bias") {
    val rows = SparkEntry.queries("emb_centroid_drift")(s, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (label, t, drifted) = (r.getInt(0), r.getDouble(4), r.getBoolean(5))
      assert(drifted == (label == 0),
        s"label $label t_stat=$t drifted=$drifted — expected only label 0 to flag")
      // the location statistic is scale-normalized: null T ≈ 1 whatever n
      if (label != 0) assert(t > 0.0 && t < 4.0, s"null label $label t_stat=$t")
      else assert(t > 10.0, s"injected drift t_stat=$t lacks margin")
    }
  }

  test("graph_truss_support histogram is conservative: edges sum to m, supports sum to 3 triangles") {
    val hist = SparkEntry.queries("graph_truss_support")(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tri = SparkEntry.queries("graph_triangles")(s, dir).head()
    val (m, t) = (tri.getLong(1), tri.getLong(2))
    assert(hist.map(_._2).sum == m,
      s"histogram covers ${hist.map(_._2).sum} edges, graph has $m")
    assert(hist.map { case (sup, n) => sup * n }.sum == 3 * t,
      "per-edge supports must total 3 per triangle")
  }

  test("sim_ivfpq_residual_recall: residual ADC is near-lossless against its coarse-probe ceiling") {
    // the IVF coarse stage caps recall (same nprobe=3 cells); the PQ
    // stage may only lose what compression costs. The round-10 probe
    // showed the RAW codebook losing (0.40 → 0.125 at sf0.1); the
    // residual+trained+reorder path must stay within one hit of the
    // ceiling per query on this corpus.
    val ceil = SparkEntry.queries("sim_ivf_recall")(s, dir)
      .select("q_id", "n_hit").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("sim_ivfpq_residual_recall")(s, dir)
      .select("q_id", "n_hit").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (q, hits) =>
      assert(hits >= ceil(q) - 1,
        s"query $q: residual ADC found $hits of the coarse ceiling ${ceil(q)}")
    }
  }

  test("emb_kmeans_converge: the fixpoint is stable (a re-run of the loop lands on the same assignment)") {
    val a = SparkEntry.queries("emb_kmeans_converge")(s, dir)
      .select("vec_id", "cell_final").collect().map(_.toString).toSeq
    val b = SparkEntry.queries("emb_kmeans_converge")(s, dir)
      .select("vec_id", "cell_final").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
