package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-8 operator batch — properties the
  * DuckDB hash gate cannot see (it proves Spark == oracle, not that
  * either is RIGHT). Each test pins a mathematical fact the operator's
  * design guarantees, via an independent in-test recomputation.
  */
class RoundEightOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("graph_connected_components: fixpoint reached — every edge's endpoints share a component, and the id is the component minimum") {
    import org.apache.spark.sql.functions._
    val cc = SparkEntry.queries("graph_connected_components")(s, dir).cache()
    // rebuild the edge list exactly as Graph.edges does
    val pl = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = pl.as("a").join(pl.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    val lu = cc.select(col("node").as("u"), col("component").as("cu"))
    val lv = cc.select(col("node").as("v"), col("component").as("cv"))
    val disagree = e.join(lu, "u").join(lv, "v")
      .filter(col("cu") =!= col("cv")).count()
    assert(disagree == 0L,
      s"$disagree edges cross component boundaries — propagation did not converge within budget")
    // component id must be the minimum member (hash-min fixpoint semantics)
    val badId = cc.groupBy("component")
      .agg(min(col("node")).as("mn"), max(col("n_nodes")).as("sz"), count(lit(1)).as("n"))
      .filter(col("mn") =!= col("component") || col("sz") =!= col("n"))
      .count()
    assert(badId == 0L, "component id != min(node) or n_nodes inconsistent with membership")
    cc.unpersist()
  }

  test("agg_percentile_dist: matches Spark's built-in exact percentile within interpolation ulps") {
    import org.apache.spark.sql.functions._
    val dist = SparkEntry.queries("agg_percentile_dist")(s, dir).collect()
      .map(r => r.getAs[Double]("pct") -> r.getAs[Double]("value")).toMap
    val builtin = Tables(s, dir, "lineitem")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"))
      .collect()(0).getSeq[Double](0)
    val pairs = Seq(0.5, 0.9, 0.99).zip(builtin)
    pairs.foreach { case (p, v) =>
      assert(math.abs(dist(p) - v) <= 1e-4,
        s"p=$p: globalRank-based $dist(p) vs built-in $v — selection picked the wrong ranks")
    }
  }

  test("agg_percentile_grouped: matches Spark's built-in grouped percentile within interpolation ulps") {
    import org.apache.spark.sql.functions._
    val dist = SparkEntry.queries("agg_percentile_grouped")(s, dir).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Double]("pct")) ->
        r.getAs[Double]("value")).toMap
    val builtin = Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"))
      .collect()
    assert(dist.size == builtin.length * 3)
    builtin.foreach { r =>
      val g = r.getAs[String]("l_returnflag")
      Seq(0.5, 0.9, 0.99).zip(r.getSeq[Double](1)).foreach { case (p, v) =>
        assert(math.abs(dist((g, p)) - v) <= 1e-4,
          s"group $g p=$p: histogram-selected ${dist((g, p))} vs built-in $v")
      }
    }
  }

  test("ts_theilsen: matches an independent in-memory Theil-Sen computation") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("ts_theilsen")(s, dir).collect()(0)
    val daily = Tables(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
      .agg(count(lit(1)).as("n"))
      .orderBy("d")
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
    val x0 = daily.map(_._1).min
    val pts = daily.map { case (d, n) => ((d - x0).toDouble, n.toDouble) }
    val slopes = (for {
      i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
    } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)).sorted
    def med(v: Seq[Double]): Double = (v((v.size - 1) / 2) + v(v.size / 2)) / 2.0
    val sl = med(slopes)
    val ic = med(pts.map { case (x, y) => y - sl * x }.sorted.toSeq)
    assert(row.getAs[Long]("n_days") == pts.length)
    assert(row.getAs[Long]("n_pairs") == slopes.size)
    assert(math.abs(row.getAs[Double]("slope") - sl) <= 1e-6,
      s"slope ${row.getAs[Double]("slope")} vs in-memory $sl")
    assert(math.abs(row.getAs[Double]("intercept") - ic) <= 1e-6,
      s"intercept ${row.getAs[Double]("intercept")} vs in-memory $ic")
  }

  test("flow_attribution_linear: credit conserves — channel totals sum exactly to total purchase value") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("flow_attribution_linear")(s, dir).collect()
    val credited = rows.map(_.getAs[Long]("credit_ucents")).sum
    val total = Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("cast(round(value * 100, 0) as bigint) * 10000")))
      .collect()(0).getLong(0)
    assert(credited == total,
      s"credited $credited micro-cents vs purchase total $total — the integer split leaked")
    val chans = rows.map(_.getAs[String]("channel")).toSet
    assert(chans.subsetOf(Set("click", "view", "(none)")), s"unexpected channels $chans")
  }

  test("ts_stl_decompose: trend + seasonal + residual reconstructs y on full-window days; edges are null-trend") {
    val rows = SparkEntry.queries("ts_stl_decompose")(s, dir).collect()
    assert(rows.length >= 14, "series too short to decompose")
    var full = 0
    rows.foreach { r =>
      val y = r.getAs[Long]("y").toDouble
      if (r.isNullAt(r.fieldIndex("trend"))) {
        assert(r.isNullAt(r.fieldIndex("residual")), "residual must be null where trend is")
      } else {
        full += 1
        val rec = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
          r.getAs[Double]("residual")
        assert(math.abs(rec - y) <= 2e-5,
          s"${r.getAs[String]("day")}: trend+seasonal+residual=$rec vs y=$y")
      }
    }
    assert(full == rows.length - 6, "exactly 3 edge days each side lack a centered window")
  }

  test("emb_covariance: Gramian-derived correlations match a direct in-memory computation") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("emb_covariance")(s, dir).collect()
    assert(out.length == 20)
    // recompute the full quantized Gramian in memory
    val vecs = Tables(s, dir, "embeddings")
      .select(expr("transform(cast(embedding as array<double>), x -> cast(round(x * 1048576) as bigint))"))
      .collect().map(_.getSeq[Long](0).toArray)
    val n = vecs.length.toLong
    val d = 64
    val sums = new Array[Long](d)
    val prods = Array.ofDim[Long](d, d)
    vecs.foreach { q =>
      var i = 0
      while (i < d) {
        sums(i) += q(i)
        var j = i
        while (j < d) { prods(i)(j) += q(i) * q(j); j += 1 }
        i += 1
      }
    }
    out.foreach { r =>
      val (i, j) = (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt)
      val covq = prods(i)(j) * n - sums(i) * sums(j)
      val corr = covq / (math.sqrt((prods(i)(i) * n - sums(i) * sums(i)).toDouble) *
        math.sqrt((prods(j)(j) * n - sums(j) * sums(j)).toDouble))
      assert(math.abs(r.getAs[Double]("corr") - corr) <= 1e-6,
        s"($i,$j): corr ${r.getAs[Double]("corr")} vs direct $corr")
    }
  }

  test("graph_modularity: matches an in-memory recomputation from the LPA communities and stays in [-0.5, 1]") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("graph_modularity")(s, dir).collect()(0)
    val q = row.getAs[Double]("modularity")
    assert(q >= -0.5 && q <= 1.0, s"modularity $q outside its mathematical range")
    // rebuild edges + communities and recompute Q directly
    val pl = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = pl.as("a").join(pl.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lbl = SparkEntry.queries("graph_label_prop")(s, dir)
      .select("node", "lbl").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = edges.length.toDouble
    val deg = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    edges.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
    val eC = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    edges.foreach { case (u, v) => if (lbl(u) == lbl(v)) eC(lbl(u)) += 1 }
    val dC = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    deg.foreach { case (n, d) => dC(lbl(n)) += d }
    val qDirect = dC.keys.map { c =>
      eC(c) / m - math.pow(dC(c) / (2 * m), 2)
    }.sum
    assert(math.abs(q - qDirect) <= 1e-5, s"modularity $q vs direct $qDirect")
    assert(row.getAs[Long]("n_communities") == dC.size)
  }

  test("text_zipf_fit: slope is negative (frequency falls with rank) with meaningful fit, matching in-memory OLS") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("text_zipf_fit")(s, dir).collect()(0)
    val slope = row.getAs[Double]("zipf_slope")
    val r2 = row.getAs[Double]("r2")
    assert(slope < 0, s"zipf slope $slope must be negative")
    assert(r2 > 0 && r2 <= 1.0, s"r2 $r2 outside (0, 1]")
    val tf = Tables.docsSpread(s, dir)
      .select(explode(expr("filter(split(text, ' '), t -> length(t) > 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("w")).limit(256)
      .collect().map(_.getAs[Long]("tf"))
    val pts = tf.zipWithIndex.map { case (f, i) =>
      (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(f.toDouble) * 1e6))
    }
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map { case (x, y) => x * y }.sum
    val sxx = pts.map { case (x, _) => x * x }.sum
    val direct = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(math.abs(slope - direct) <= 1e-6, s"slope $slope vs direct $direct")
  }

  test("agg_percentile_weighted: matches the in-memory type-1 weighted quantile") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("agg_percentile_weighted")(s, dir).collect()
      .map(r => r.getAs[Double]("pct") -> r.getAs[Double]("value")).toMap
    val vw = Tables(s, dir, "lineitem")
      .select(col("l_extendedprice"), expr("cast(round(l_quantity) as bigint)"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(_._1)
    val total = vw.map(_._2).sum
    Seq(50L, 90L, 99L).foreach { p100 =>
      var cw = 0L
      val target = p100 * total // cw*100 >= p100*W
      val v = vw.find { case (_, w) => cw += w; cw * 100 >= target }.get._1
      val got = out(p100 / 100.0)
      assert(math.abs(got - v) <= 1e-6, s"p$p100: $got vs direct $v")
    }
  }

  test("graph_assortativity: matches an in-memory Pearson correlation of edge endpoint degrees") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("graph_assortativity")(s, dir).collect()(0)
    val pl = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = pl.as("a").join(pl.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    edges.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
    val pairs = edges.flatMap { case (u, v) =>
      Seq((deg(u).toDouble, deg(v).toDouble), (deg(v).toDouble, deg(u).toDouble)) }
    val bm = pairs.length.toDouble
    val sx = pairs.map(_._1).sum
    val sxy = pairs.map { case (x, y) => x * y }.sum
    val sxx = pairs.map { case (x, _) => x * x }.sum
    val direct = (bm * sxy - sx * sx) / (bm * sxx - sx * sx)
    assert(row.getAs[Long]("m") == edges.length)
    assert(math.abs(row.getAs[Double]("assortativity") - direct) <= 1e-5,
      s"r ${row.getAs[Double]("assortativity")} vs direct $direct")
  }

  test("dq_outlier_iqr: quartiles, fences and outlier counts match an in-memory Tukey computation") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("dq_outlier_iqr")(s, dir).collect()(0)
    val vs = Tables(s, dir, "orders").select(col("o_totalprice")).collect()
      .map(_.getDouble(0)).sorted
    val n = vs.length
    def q(p: Int): Double = vs((((p * n) + 99) / 100) - 1) // smallest v with r*100 >= p*n
    val (q1, q3) = (q(25), q(75))
    val iqr = q3 - q1
    val (lo, hi) = (q1 - 1.5 * iqr, q3 + 1.5 * iqr)
    assert(row.getAs[Long]("n") == n)
    assert(math.abs(row.getAs[Double]("q1") - q1) <= 1e-6, s"q1 ${row.getAs[Double]("q1")} vs $q1")
    assert(math.abs(row.getAs[Double]("q3") - q3) <= 1e-6)
    assert(row.getAs[Long]("n_low") == vs.count(_ < lo))
    assert(row.getAs[Long]("n_high") == vs.count(_ > hi))
  }

  test("train_curriculum: 4 contiguous easy-to-hard phases of near-equal size covering every doc") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("train_curriculum")(s, dir).collect()
    assert(rows.map(_.getAs[Long]("phase")).toSeq == Seq(1L, 2L, 3L, 4L))
    val total = Tables(s, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total, "phases must cover every doc")
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1, s"ntile sizes must differ by <= 1: ${sizes.mkString(",")}")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_tok") <= b.getAs[Long]("min_tok"),
        s"phase ${a.getAs[Long]("phase")} max_tok ${a.getAs[Long]("max_tok")} exceeds " +
          s"phase ${b.getAs[Long]("phase")} min_tok ${b.getAs[Long]("min_tok")} — phases not difficulty-contiguous")
    }
  }

  test("sim_knn_classify: prediction is exactly the majority vote of the brute top-5 neighbor labels") {
    import org.apache.spark.sql.functions._
    val knn = SparkEntry.queries("sim_knn_classify")(s, dir).collect()
    assert(knn.length == 8, "one prediction per query vector")
    val nbrs = SparkEntry.queries("sim_cosine_topk")(s, dir)
      .select(col("q_id"), col("cand_id"))
    val lbl = Tables(s, dir, "embeddings")
      .select(col("vec_id").as("cand_id"), col("label").as("cand_label"))
    val votes = nbrs.join(lbl, "cand_id")
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) =>
        val counts = rs.groupBy(_.getAs[Int]("cand_label")).view.mapValues(_.length).toMap
        val (bestLbl, bestN) = counts.toSeq.sortBy { case (l, n) => (-n, l) }.head
        q -> (bestLbl.toLong, bestN.toLong)
      }
    knn.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val (wantLbl, wantN) = votes(q)
      assert(r.getAs[Long]("pred_label") == wantLbl,
        s"q=$q: predicted ${r.getAs[Long]("pred_label")}, majority is $wantLbl")
      assert(r.getAs[Long]("n_votes") == wantN, s"q=$q: vote count mismatch")
      assert(r.getAs[Long]("n_votes") >= 1 && r.getAs[Long]("n_votes") <= 5)
    }
  }
}
