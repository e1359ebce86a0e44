package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 additions: invariants the driver's hash-compare can't express,
  * plus loud guards for documented scale bounds.
  */
class RoundFiveOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("mm_decode_stub sums UTF-8 BYTES, not code points, on a non-ASCII corpus") {
    import s.implicits._
    // 14 code points but 18 UTF-8 bytes — a code-point implementation
    // (or oracle) would report n_bytes=14 and a different mean
    val text = "héllo wörld …."
    val bytes = text.getBytes("UTF-8").map(_ & 0xff)
    assert(bytes.length == 18 && text.length == 14)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mmspec").toString
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = operators.Multimodal.queries("mm_decode_stub")(s, tmp).collect().head
    assert(r.getAs[Long]("n_bytes") == bytes.length.toLong)
    assert(math.abs(r.getAs[Double]("mean_byte") - bytes.sum.toDouble / bytes.length) < 1e-12)
  }

  test("win_topk_agg oracle key packing requires o_orderkey < 2^24 — fail loudly at larger SF") {
    val maxKey = Tables(s, dir, "orders")
      .agg(max(col("o_orderkey"))).collect().head.getLong(0)
    assert(maxKey < (1L << 24),
      s"o_orderkey max $maxKey >= 2^24: the win_topk_agg oracle's " +
        "cents*2^24 + (2^24-1-orderkey) packing overflows — widen the field " +
        "(see Analytic.winTopkAgg scaladoc) before trusting that oracle")
  }

  test("text_span_scrub: counts are consistent and untouched docs fingerprint their original tokens") {
    val out = operators.Dedup.queries("text_span_scrub")(s, dir).collect()
    val docs = Tables(s, dir, "documents").count()
    assert(out.length == docs, "one output row per document")
    assert(out.forall(r => r.getAs[Long]("n_scrubbed") >= 0 &&
      r.getAs[Long]("n_scrubbed") <= r.getAs[Long]("n_tokens")))
    assert(out.exists(_.getAs[Long]("n_scrubbed") > 0),
      "corpus has duplicated spans; scrub must be non-vacuous")
    // untouched docs: cleaned text == whitespace-normalized original
    val expect = Tables(s, dir, "documents")
      .select(col("doc_id"), md5(expr(
        "concat_ws(' ', filter(split(text, ' '), t -> length(t) > 0))")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val untouched = out.filter(_.getAs[Long]("n_scrubbed") == 0)
    assert(untouched.nonEmpty)
    untouched.foreach { r =>
      assert(r.getAs[String]("clean_fp") == expect(r.getAs[Long]("doc_id")))
    }
  }

  test("text_span_scrub keeps every duplicated span's first occurrence: scrubbed tokens < total dup coverage") {
    // the corpus-wide first occurrence of each dup span is preserved, so
    // total scrubbed tokens must be strictly less than total tokens under
    // duplicated spans (which includes the kept first occurrences)
    val out = operators.Dedup.queries("text_span_scrub")(s, dir).collect()
    val scrubbed = out.map(_.getAs[Long]("n_scrubbed")).sum
    val spanRows = operators.Dedup.queries("dedup_span")(s, dir).collect()
    assert(spanRows.nonEmpty)
    // n_occ spans of 8 tokens each bound coverage from above
    val upper = spanRows.map(r => r.getAs[Long]("n_occ") * 8).sum
    assert(scrubbed > 0 && scrubbed < upper,
      s"scrubbed=$scrubbed not in (0, $upper)")
  }

  test("agg_approx_distinct accuracy claim holds: every group within 5% of exact") {
    val rows = operators.Relational.queries("agg_approx_distinct")(s, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_5pct")),
      "HLL estimate drifted past its documented 5% bound")
  }

  test("join_null_safe really exercises the NULL group (injected keys match across sides)") {
    val rows = operators.Relational.queries("join_null_safe")(s, dir).collect()
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length == 1, "exactly one NULL-day group must survive the <=> join")
    assert(nullRow.head.getLong(1) > 0 && nullRow.head.getLong(2) > 0)
  }

  test("sim_cosine_topk_ivfpq: ADC winners carry near-IVF exact quality and bounded ADC error") {
    val pq = operators.Sim.queries("sim_cosine_topk_ivfpq")(s, dir).collect()
    assert(pq.length == 8 * 5, "5 ADC winners per query vector")
    // ADC score approximates the exact cosine through an 8-byte code:
    // reconstruction error is bounded, never sign-flipping, on this corpus
    assert(pq.forall { r =>
      math.abs(r.getAs[Double]("adc_sim") - r.getAs[Double]("cos_exact")) < 0.5
    })
    // quality: the EXACT cosine of the ADC-selected candidates must sit
    // near what exact scoring over the same probed cells achieves — the
    // guarantee an ADC+refine stage actually offers (per-rank recall
    // inside a tight cluster is noise-dominated at this corpus size)
    val ivfMean = operators.Sim.queries("sim_cosine_topk_ivf")(s, dir).collect()
      .map(_.getAs[Double]("cos_sim")).sum / 40
    val adcMean = pq.map(_.getAs[Double]("cos_exact")).sum / 40
    assert(adcMean >= ivfMean - 0.15,
      s"ADC selection quality collapsed: exact-of-ADC mean $adcMean vs IVF mean $ivfMean")
  }

  test("text_readability counts are exact and formulas agree with a reference recomputation") {
    val rows = operators.Text.queries("text_readability")(s, dir).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val (w, se, sy) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_sents"), r.getAs[Long]("n_syll"))
      assert(w > 0 && se >= 1 && sy >= w, "every word contributes >= 1 syllable")
      val flesch = BigDecimal(206.835 - 1.015 * (w.toDouble / se) - 84.6 * (sy.toDouble / w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(flesch - r.getAs[Double]("flesch")) < 1e-9)
    }
  }

  test("flow_path_topk: ranks are dense, counts non-increasing, paths at most 5 steps") {
    val rows = operators.Flow.queries("flow_path_topk")(s, dir).collect()
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to rows.length))
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[String]("path").split(">").length <= 5))
    val users = Tables(s, dir, "events").select("user_id").distinct().count()
    assert(counts.sum <= users, "top-10 path users cannot exceed the user population")
  }

  test("dp_rr_count: debias identity holds and the estimate tracks the true count") {
    val rows = operators.Ingest.queries("dp_rr_count")(s, dir).collect()
    rows.foreach { r =>
      val (n, t, rep) = (r.getAs[Long]("n"), r.getAs[Long]("true_count"),
        r.getAs[Long]("reported_count"))
      assert(rep >= 0 && rep <= n && t <= n)
      val est = (rep.toDouble - 0.25 * n) / 0.5
      assert(est == r.getAs[Double]("dp_estimate"))
      // hash-coin noise is binomial: 4·sqrt(n·p·(1−p))/(1−2p) ≈ 3.5·sqrt(n)
      assert(math.abs(est - t) <= 3.5 * math.sqrt(n.toDouble) + 1,
        s"nation ${r.get(0)}: estimate $est too far from true $t (n=$n)")
    }
  }

  test("mm_audio_energy frames are complete, bounded, and rms^2 recovers energy/32") {
    val rows = operators.Multimodal.queries("mm_audio_energy")(s, dir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { fs =>
      val idx = fs.map(_.getAs[Long]("frame_idx")).sorted
      assert(idx.head == 0 && idx.last == idx.length - 1 && idx.length <= 8,
        "frame indices must be dense 0..n-1 with at most 8 frames")
    }
    rows.foreach { r =>
      val (e, rms) = (r.getAs[Long]("energy"), r.getAs[Double]("rms"))
      assert(e >= 0 && r.getAs[Long]("peak") <= 127)
      assert(math.abs(rms * rms - e.toDouble / 32.0) < 1e-3)
    }
  }

  test("sql_q18_big_orders: every order clears the HAVING threshold and totals are consistent") {
    val rows = operators.Sql.queries("sql_q18_big_orders")(s, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getAs[Long]("sum_qty_c") > 20000L))
    val totals = rows.map(_.getAs[Long]("total_cents"))
    assert(totals.zip(totals.tail).forall { case (a, b) => a >= b }, "sorted by total desc")
  }

  test("graph_degree_stats bins partition the node set with consistent bounds") {
    val rows = operators.Graph.queries("graph_degree_stats")(s, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val (lo, hi) = (1L << bin, (1L << (bin + 1)) - 1)
      assert(r.getAs[Long]("min_deg") >= lo && r.getAs[Long]("max_deg") <= hi,
        s"bin $bin bounds [${r.getAs[Long]("min_deg")}, ${r.getAs[Long]("max_deg")}] outside [$lo, $hi]")
    }
  }

  test("flow_rfm_segments: quintile scores are 1..5 and balanced within one row") {
    val rows = operators.Flow.queries("flow_rfm_segments")(s, dir).collect()
    assert(rows.nonEmpty)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val byScore = rows.groupBy(_.getAs[Int](c)).view.mapValues(_.length)
      assert(byScore.keys.forall(k => k >= 1 && k <= 5))
      // ntile balance: bucket sizes differ by at most 1
      assert(byScore.values.max - byScore.values.min <= 1, s"$c buckets unbalanced")
    }
    assert(rows.forall(r => r.getAs[String]("segment") ==
      s"${r.getAs[Int]("r_score")}${r.getAs[Int]("f_score")}${r.getAs[Int]("m_score")}"))
  }

  test("ts_cusum_changepoint: scaled cusum telescopes to zero and flags the global min") {
    val rows = operators.Flow.queries("ts_cusum_changepoint")(s, dir).collect()
    assert(rows.nonEmpty)
    // sum over all days of (n*D - total) telescopes to exactly 0
    assert(rows.last.getAs[Long]("s_scaled") == 0L)
    val mins = rows.filter(_.getAs[Boolean]("is_min_cusum"))
    val minVal = rows.map(_.getAs[Long]("s_scaled")).min
    assert(mins.nonEmpty && mins.forall(_.getAs[Long]("s_scaled") == minVal))
  }

  test("agg_ols2 covers every lineitem row and produces finite coefficients") {
    val rows = operators.Fn.queries("agg_ols2")(s, dir).collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == Tables(s, dir, "lineitem").count())
    rows.foreach { r =>
      Seq("b_qty", "b_disc", "b0").foreach { c =>
        val v = r.getAs[Double](c)
        assert(!v.isNaN && !v.isInfinite, s"$c not finite: $v")
      }
    }
  }

  test("sim_ivfpq_recall: one row per query, recall in [0,1] and above random") {
    val rows = operators.Sim.queries("sim_ivfpq_recall")(s, dir).collect()
    assert(rows.length == 8)
    val recalls = rows.map(_.getAs[Double]("recall_at_5"))
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    assert(recalls.sum / 8 >= 0.1, s"mean ADC recall collapsed: ${recalls.sum / 8}")
  }

  test("cdc_apply_deletes: post-merge row count = base - deletes + inserts") {
    val o = Tables(s, dir, "orders")
    val base = o.count()
    val dels = o.filter(col("o_orderkey") % 11 === 0).count()
    val ins = o.filter(col("o_orderkey") % 13 === 0).count()
    val merged = operators.Flow.queries("cdc_apply_deletes")(s, dir).collect()
    assert(merged.map(_.getAs[Long]("n")).sum == base - dels + ins)
    assert(merged.exists(_.getAs[String]("status") == "U"), "updates must surface")
    assert(merged.exists(_.getAs[String]("status") == "N"), "inserts must surface")
  }

  test("text_lang_confusion: shares sum to 1 per true lang and diagonal dominates") {
    val rows = operators.Text.queries("text_lang_confusion")(s, dir).collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val total = rs.map(_.getAs[Double]("share_of_true")).sum
      assert(math.abs(total - 1.0) < 1e-9, s"$lang shares sum to $total")
    }
    val n = rows.map(r => ((r.getAs[String]("lang"), r.getAs[String]("pred_lang")), r.getAs[Long]("n"))).toMap
    val diag = n.collect { case ((a, b), v) if a == b => v }.sum
    assert(diag.toDouble / n.values.sum > 0.25,
      "lang-ID should beat 5-class chance (0.2) on its own corpus")
  }

  test("dp_geometric_counts: noise clamps at 8 and the zero mass tracks 1/3") {
    // run at sf0.01 for enough groups to test the distribution shape
    val rows = operators.Ingest.queries("dp_geometric_counts")(s, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Long]("noise")
      assert(math.abs(z) <= 8)
      assert(r.getAs[Long]("dp_count") == r.getAs[Long]("n") + z)
    }
    val zeroShare = rows.count(_.getAs[Long]("noise") == 0L).toDouble / rows.length
    // P(0) = 1/3; allow 4 sigma of binomial spread
    val tol = 4 * math.sqrt((1.0 / 3) * (2.0 / 3) / rows.length)
    assert(math.abs(zeroShare - 1.0 / 3) < tol,
      s"zero-noise share $zeroShare departs from 1/3 (tol $tol)")
  }

  test("graph_link_predict: predictions are non-edges with positive support, ranked densely") {
    val rows = operators.Graph.queries("graph_link_predict")(s, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to rows.length))
    assert(rows.forall(r => r.getAs[Long]("common") >= 1 &&
      r.getAs[Long]("u") < r.getAs[Long]("v")))
    val counts = rows.map(_.getAs[Long]("common"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("mm_shot_boundary agrees with the integer delta rule frame by frame") {
    val rows = operators.Multimodal.queries("mm_shot_boundary")(s, dir).collect()
    assert(rows.nonEmpty)
    rows.take(200).foreach { r =>
      val (e, p) = (r.getAs[Long]("energy"), r.getAs[Long]("prev_energy"))
      assert(r.getAs[Boolean]("is_boundary") == (20 * math.abs(e - p) > 3 * p))
    }
    assert(rows.exists(_.getAs[Boolean]("is_boundary")) &&
      rows.exists(!_.getAs[Boolean]("is_boundary")), "detector must be non-vacuous")
  }

  test("ts_dow_seasonality: 7 indices whose day-weighted mean is exactly 1") {
    val rows = operators.Flow.queries("ts_dow_seasonality")(s, dir).collect()
    assert(rows.length == 7)
    val totalDays = rows.map(_.getAs[Long]("n_days")).sum
    // Σ dow (idx_dow · n_days_dow) / D = Σ n_events / total = 1 by construction
    val weighted = rows.map(r => r.getAs[Double]("idx") * r.getAs[Long]("n_days")).sum / totalDays
    assert(math.abs(weighted - 1.0) < 1e-4, s"weighted mean index $weighted != 1")
  }

  test("win_share_of_parent: shares sum to 1 per region and cents are consistent") {
    val rows = operators.Analytic.queries("win_share_of_parent")(s, dir).collect()
    rows.groupBy(_.getAs[String]("r_name")).foreach { case (region, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4,
        s"$region shares do not sum to 1")
      val rc = rs.head.getAs[Long]("region_cents")
      assert(rs.forall(_.getAs[Long]("region_cents") == rc))
      assert(rs.map(_.getAs[Long]("nation_cents")).sum == rc)
    }
  }

  test("dq_kanonymity partitions every customer row and k bounds are consistent") {
    val rows = operators.Ingest.queries("dq_kanonymity")(s, dir).collect()
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == Tables(s, dir, "customer").count(), "metrics must cover every row")
    rows.foreach { r =>
      assert(r.getAs[Long]("k_anonymity") >= 1)
      assert(r.getAs[Long]("rows_at_risk") <= r.getAs[Long]("n_rows"))
      assert((r.getAs[Long]("n_unsafe_groups") == 0) == (r.getAs[Long]("rows_at_risk") == 0))
    }
  }
}
