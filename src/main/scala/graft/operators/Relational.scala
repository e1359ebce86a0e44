package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecFunctions.kmv_distinct

/** Core relational operator pack: scans+filters, all join shapes,
  * hash/distinct/grouping-set aggregation, sort/limit/top-k, set ops.
  *
  * Design rules (apply to every query in this engine):
  *  - fully declarative DataFrame plans so Catalyst pushes filters/prunes
  *    columns into the parquet scan and picks join strategies (AQE);
  *  - small dimension tables are explicitly `broadcast()` — at 100 TB the
  *    fact tables shuffle, the dims never should;
  *  - every query ends in a total ordering so results are deterministic;
  *  - double aggregates go through [[graft.Det]] so results hash-match the
  *    DuckDB oracle bit-for-bit.
  */
object Relational {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- filters

  /** Conjunctive + disjunctive predicates, BETWEEN, IN, LIKE, IS NULL —
    * all pushed to the parquet scan (PushedFilters in explain).
    */
  private val filterPushdown: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    li.filter(
        (col("l_shipdate").between(lit("1995-01-01").cast("timestamp"),
                                   lit("1996-12-31").cast("timestamp"))
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24
          && col("l_returnflag").isin("A", "N")
          && col("l_linestatus").like("%F%"))
          || col("l_shipdate").isNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ------------------------------------------------------------------ joins

  /** Dim-dim-fact star join; both dims broadcast (no shuffle of customer). */
  private val joinInnerHash: Q = (s, dir) => {
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy("r_name", "n_name")
  }

  /** Large-large join: orders x lineitem, forced shuffle-sort-merge (the
    * strategy that survives at 100 TB where neither side broadcasts).
    */
  private val joinSortMerge: Q = (s, dir) => {
    val o = Tables(s, dir, "orders").hint("merge")
    val li = Tables(s, dir, "lineitem")
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Shuffled hash join — the third strategy in the join matrix (broadcast
    * `join_inner_hash`, sort-merge `join_sortmerge`, bucketed
    * `join_bucketed`). For a medium build side that exceeds the broadcast
    * threshold but fits per-partition in executor memory, hashing the
    * build side skips BOTH sort passes a sort-merge join pays — on a 100 TB
    * fact⋈mid-size-dim this is the cheapest shuffle join available. The
    * SHUFFLE_HASH hint forces it (AQE would otherwise pick by stats);
    * PlanEvidenceSpec pins ShuffledHashJoin in the physical plan.
    */
  private val joinShuffleHash: Q = (s, dir) => {
    val c = Tables(s, dir, "customer").hint("shuffle_hash")
    val o = Tables(s, dir, "orders")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_total"))
      .orderBy("c_mktsegment")
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): per-ship-day
    * aggregates of two return-flag slices joined so that the NULL-day
    * group on one side matches the NULL-day group on the other — the
    * semantics a plain equi-join silently drops. TPC-H l_shipdate has no
    * NULLs, so a deterministic NULL key is injected (ship_day nulled for
    * l_orderkey % 10 = 0, mirrored in the oracle — same pattern as
    * winIgnoreNulls): both sides then really do carry a NULL group, and a
    * plain equi-join would drop it and fail the hash. Spark plans `<=>`
    * as an ordinary hash-join key (null keys co-partition like any
    * value), so the 100 TB shape is identical to an equi-join. Output
    * ordering pins NULLS FIRST explicitly on both engines (their
    * defaults differ).
    */
  private val joinNullSafe: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
      .withColumn("ship_day",
        when(col("l_orderkey") % 10 === 0, lit(null))
          .otherwise(date_format(col("l_shipdate"), "yyyy-MM-dd")))
    val a = li.filter(col("l_returnflag") === "A")
      .groupBy("ship_day").agg(count(lit(1)).as("n_a"))
    val r = li.filter(col("l_returnflag") === "R")
      .groupBy(col("ship_day").as("r_day")).agg(count(lit(1)).as("n_r"))
    a.join(r, col("ship_day") <=> col("r_day"))
      .select(col("ship_day"), col("n_a"), col("n_r"))
      .orderBy(col("ship_day").asc_nulls_first)
  }

  /** Multiple exact COUNT(DISTINCT) in one aggregation — Spark rewrites
    * this to an Expand (one row replica per distinct group) + two-phase
    * aggregation, the distributed plan for multi-distinct without
    * re-scanning per aggregate (plan-pinned in PlanEvidenceSpec). The
    * shuffle carries (group, replica) rows, so at 100 TB the cost is
    * #distinct-aggs × rows, never #aggs full scans.
    */
  private val aggMultiDistinct: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        countDistinct(col("l_quantity")).as("nd_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Left outer join keeping customers with zero orders. */
  private val joinLeft: Q = (s, dir) => {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(o("o_orderkey")).as("n_orders"),
        dsum(coalesce(o("o_totalprice"), lit(0.0))).as("sum_total"))
      .orderBy("c_custkey")
  }

  /** Full outer join of two pre-aggregated sides (supplier vs customer
    * presence per nation). Pre-aggregating before the outer join keeps the
    * shuffled data minimal at scale.
    */
  private val joinFull: Q = (s, dir) => {
    val sup = Tables(s, dir, "supplier")
      .groupBy("s_nationkey").agg(count(lit(1)).as("n_sup"))
    val cus = Tables(s, dir, "customer")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    sup.join(cus, sup("s_nationkey") === cus("c_nationkey"), "full")
      .select(
        coalesce(sup("s_nationkey"), cus("c_nationkey")).as("nationkey"),
        coalesce(col("n_sup"), lit(0L)).as("n_sup"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"))
      .orderBy("nationkey")
  }

  /** Left-semi (EXISTS): orders having at least one heavy lineitem. */
  private val joinSemi: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
    val heavy = Tables(s, dir, "lineitem").filter(col("l_quantity") >= 49)
    o.join(heavy, o("o_orderkey") === heavy("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Left-anti (NOT EXISTS): customers with no high-value orders. */
  private val joinAnti: Q = (s, dir) => {
    val c = Tables(s, dir, "customer")
    val big = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Theta join: equi key + range residual (quantity exceeds part size).
    * The equi conjunct keeps it a hash/merge join — never a cartesian.
    */
  private val joinTheta: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val p = Tables(s, dir, "part")
    li.join(broadcast(p),
        li("l_partkey") === p("p_partkey") && li("l_quantity") > p("p_size"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("p_brand")
  }

  /** Banded range join via binning — the scale path for pure range
    * predicates (no equi conjunct). A naive `o_totalprice BETWEEN
    * c_acctbal ± 100` join is a cartesian product at cluster scale;
    * mapping both sides to width-200 bins (each ±100 window spans ≤ 2
    * bins) turns it into an ordinary hash equi-join on the bin id with an
    * exact residual filter — O(n) shuffle, no cross product. The oracle
    * is the plain BETWEEN join, proving the binning preserves semantics.
    */
  /** Interval-overlap join without a quadratic theta. Each lineitem's
    * transit window [l_shipdate, ship + (l_orderkey % 45 + 1) days] is
    * exploded into the calendar months it touches (bounded fan-out:
    * at most 3 bins for a <=46-day window), then equi-joined to the
    * audit-month dimension — a month overlaps [s, e] iff it lies
    * between month(s) and month(e), so the bin join is exact, not a
    * candidate filter. The oracle states the same semantics as the
    * naive overlap theta (`ship < m+1mo AND end >= m`); at 100 TB the
    * theta is a nested-loop over months x rows while this plan is one
    * generator + a broadcast hash join on the bin key.
    */
  private val joinIntervalOverlap: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
      .withColumn("t_end",
        expr("timestampadd(DAY, CAST(l_orderkey % 45 + 1 AS INT), l_shipdate)"))
    val months = li.select(date_trunc("month", col("l_shipdate")).as("audit_month"))
      .distinct()
    li.select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        explode(sequence(date_trunc("month", col("l_shipdate")),
          date_trunc("month", col("t_end")), expr("interval 1 month")))
          .as("audit_month"))
      .join(broadcast(months), "audit_month")
      .groupBy("audit_month")
      .agg(count(lit(1)).as("n_overlap"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("audit_month")
  }

  private val joinRangeBinned: Q = (s, dir) => {
    val bw = 200.0
    val c = Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("bin", explode(array_distinct(array(
        floor((col("c_acctbal") - 100.0) / bw).cast("long"),
        floor((col("c_acctbal") + 100.0) / bw).cast("long")))))
    val o = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("bin", floor(col("o_totalprice") / bw).cast("long"))
    c.join(o, "bin")
      .filter(col("o_totalprice").between(
        col("c_acctbal") - 100.0, col("c_acctbal") + 100.0))
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("n_near"), dsum(col("o_totalprice")).as("sum_near"))
      .orderBy("c_custkey")
  }

  // ------------------------------------------------------------- aggregates

  /** Flagship: TPC-H Q1 shape — scan, filter, hash agg (partial+final),
    * sort. Whole pipeline stays in whole-stage codegen.
    */
  val aggHash: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val aggDistinct: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** approx_count_distinct (HLL++). The raw sketch estimate is
    * engine-specific, so the hash-verified contract is the ACCURACY claim,
    * not the estimate: emit the exact ND (computable in both engines) and
    * a boolean `within_5pct` = |approx - exact| / exact <= 0.05. DuckDB
    * recomputes the exact side and asserts TRUE — Spark's HLL drifting
    * past its documented error bound flips the hash. (agg_kmv_distinct is
    * the companion sketch whose estimate itself is cross-engine exact.)
    */
  private val aggApproxDistinct: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    li.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("exact_nd_part"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .select(
        col("l_returnflag"), col("exact_nd_part"),
        (abs(col("approx") - col("exact_nd_part")).cast("double") /
          col("exact_nd_part") <= 0.05).as("within_5pct"))
      .orderBy("l_returnflag")
  }

  /** Apache DataSketches HLL with an explicit two-level merge: partial
    * sketches per (flag, status) cell (`hll_sketch_agg`), unioned up to
    * per-flag (`hll_union_agg`) — the mergeable-state pattern a
    * 1000-executor cluster uses to count distincts without ever moving
    * raw keys: each executor ships one fixed-size sketch (2^lgK
    * registers), and coarser re-aggregations (day -> month -> total)
    * reuse the stored partials instead of rescanning the fact table.
    * Verified like [[aggApproxDistinct]]: the pinned contract is the
    * accuracy claim (lgK=14 gives ~0.8% standard error, asserted at 5%),
    * not the engine-specific register estimate.
    */
  private val aggHllUnion: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val merged = li.groupBy("l_returnflag", "l_linestatus")
      .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk"))
      .groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx"))
    li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_nd_part"))
      .join(broadcast(merged), "l_returnflag")
      .select(col("l_returnflag"), col("exact_nd_part"),
        (abs(col("approx") - col("exact_nd_part")).cast("double") /
          col("exact_nd_part") <= 0.05).as("within_5pct"))
      .orderBy("l_returnflag")
  }

  /** Count-min sketch point-frequency estimates — the third mergeable
    * sketch family (after HLL distinct and KMV/Misra-Gries): Spark's
    * codegen'd `count_min_sketch` aggregate builds fixed-size partials
    * per (flag, status) cell, an executor-side UDF merges the cell
    * binaries per flag (`CountMinSketch.mergeInPlace` — the public
    * org.apache.spark.util.sketch API), and probes for suppkeys 1–5 read
    * the merged sketch. At 100 TB only eps-bounded counter grids cross
    * the shuffle, never per-key counts, and coarser rollups reuse stored
    * cell partials. Pinned contract (CMS guarantees, not register
    * contents): estimates never undercount, and overcount ≤ eps·N —
    * deterministic here because the seed is fixed.
    */
  private val aggCmsHeavy: Q = (s, dir) => {
    import org.apache.spark.util.sketch.CountMinSketch
    val li = Tables(s, dir, "lineitem")
    val partials = li.groupBy("l_returnflag", "l_linestatus")
      .agg(expr("count_min_sketch(l_suppkey, CAST(0.0001 AS DOUBLE), CAST(0.999 AS DOUBLE), 42)").as("sk"))
    val mergeCms = udf((sks: Seq[Array[Byte]]) => {
      val merged = sks.map(b => CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
        .reduce((a, b) => a.mergeInPlace(b))
      val bos = new java.io.ByteArrayOutputStream()
      merged.writeTo(bos)
      bos.toByteArray
    })
    val estCms = udf((sk: Array[Byte], key: Long) =>
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sk)).estimateCount(key))
    val merged = partials.groupBy("l_returnflag")
      .agg(mergeCms(collect_list(col("sk"))).as("sk"))
    val probes = merged
      .select(col("l_returnflag"), col("sk"),
        explode(expr("sequence(CAST(1 AS BIGINT), CAST(5 AS BIGINT))")).as("l_suppkey"))
      .withColumn("est", estCms(col("sk"), col("l_suppkey")))
    val exact = li.filter(col("l_suppkey").between(1L, 5L))
      .groupBy("l_returnflag", "l_suppkey").agg(count(lit(1)).as("true_cnt"))
    val totals = li.groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
    probes.join(exact, Seq("l_returnflag", "l_suppkey"))
      .join(broadcast(totals), "l_returnflag")
      .select(col("l_returnflag"), col("l_suppkey"), col("true_cnt"),
        (col("est") >= col("true_cnt")).as("no_undercount"),
        ((col("est") - col("true_cnt")).cast("double") <=
          lit(0.0001) * col("n_rows").cast("double")).as("within_eps"))
      .orderBy("l_returnflag", "l_suppkey")
  }

  /** KMV sketch SET OPERATIONS — the reason to keep the bottom-k array
    * ([[org.apache.spark.sql.graft.KmvSketch]]) and not just the
    * estimate: two segment sketches (two monthly ship cohorts' part
    * sets) combine
    * into union, Jaccard, and intersection estimates with pure array
    * arithmetic — merged bottom-k, matching fraction, ρ·|A∪B| — without
    * ever co-shuffling the segments' raw keys. At 100 TB each segment
    * ships one k-long array and every pairwise overlap question is
    * answered from stored sketches. Purely set-determined state, so the
    * DuckDB oracle replays arrays and estimates exactly (same
    * hash-verified-approximation contract as agg_kmv_distinct).
    */
  private val sketchKmvSetops: Q = (s, dir) => {
    import org.apache.spark.sql.graft.VecFunctions.kmv_sketch
    // two monthly ship cohorts: partial part-set overlap at every SF
    // (flag-based segments both cover the whole part domain — Jaccard
    // would degenerate to 1.0 and never exercise the matching logic)
    val li = Tables(s, dir, "lineitem")
      .withColumn("seg", date_format(col("l_shipdate"), "yyyy-MM"))
      .filter(col("seg").isin("1995-01", "1995-02"))
      .withColumn("h",
        expr("cast(conv(substr(md5(cast(l_partkey as string)), 1, 15), 16, 10) as bigint)"))
    val sk = li.groupBy("seg").agg(kmv_sketch(col("h"), 64).as("sk"))
    val a = sk.filter(col("seg") === "1995-01").select(col("sk").as("sa"))
    val b = sk.filter(col("seg") === "1995-02").select(col("sk").as("sb"))
    val ex = li.groupBy("l_partkey")
      .agg(max(when(col("seg") === "1995-01", 1).otherwise(0)).as("ia"),
        max(when(col("seg") === "1995-02", 1).otherwise(0)).as("ib"))
      .agg(count(lit(1)).as("exact_union"),
        sum(col("ia") * col("ib")).as("exact_inter"))
    a.crossJoin(b).crossJoin(ex)
      .withColumn("sab", slice(array_sort(array_union(col("sa"), col("sb"))), 1, 64))
      .withColumn("u_est",
        when(size(col("sab")) < 64, size(col("sab")).cast("double"))
          .otherwise(lit(63.0) * lit(1152921504606846976.0) /
            element_at(col("sab"), 64).cast("double")))
      .withColumn("matches",
        size(array_intersect(array_intersect(col("sab"), col("sa")), col("sb")))
          .cast("bigint"))
      .withColumn("jacc",
        col("matches").cast("double") / size(col("sab")).cast("double"))
      .select(lit(64L).as("k"), col("matches"),
        round(col("u_est"), 4).as("union_est"), col("jacc"),
        round(col("jacc") * col("u_est"), 4).as("inter_est"),
        col("exact_union"), col("exact_inter"))
  }

  /** 2-D skyline (Pareto front): orders that are CHEAP and RECENT —
    * no other order is at-most-as-expensive AND at-least-as-recent with
    * one strict. The textbook definition is an O(n²) NOT EXISTS
    * anti-join (exactly what the oracle runs); the engine runs the
    * sort-based linear algorithm instead: distinct points ordered by
    * (price ASC, date DESC) are on the front iff their date strictly
    * exceeds the running max over all strictly-preceding rows. Two
    * phases, skyline-of-skylines: a per-partition local front first
    * (any global survivor survives locally, whatever the partitioning),
    * so the single-partition global pass sees only the few local
    * survivors — at 100 TB every full-data step stays parallel and the
    * serial step is front-sized. Hash-matching the two algorithms
    * proves the algorithm, not just the numbers. Prices compare in
    * exact cents; the OUTPUT is partitioning-independent even though
    * the intermediate candidate set is not.
    */
  private val skylinePareto: Q = (s, dir) => {
    val pts = Tables(s, dir, "orders")
      .select(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("price_cents"),
        col("o_orderdate").as("od"))
      .groupBy("price_cents", "od").agg(count(lit(1)).as("n_orders"))
    val wl = Window.partitionBy("pid")
      .orderBy(col("price_cents").asc, col("od").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cand = pts.withColumn("pid", spark_partition_id())
      .withColumn("bp", max(col("od")).over(wl))
      .filter(col("bp").isNull || col("od") > col("bp"))
      .drop("pid", "bp")
    val w = Window.orderBy(col("price_cents").asc, col("od").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    cand.withColumn("best_prev", max(col("od")).over(w))
      .filter(col("best_prev").isNull || col("od") > col("best_prev"))
      .select(col("price_cents"),
        date_format(col("od"), "yyyy-MM-dd").as("order_day"), col("n_orders"))
      .orderBy("price_cents")
  }

  private val aggRollup: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
    o.rollup("o_orderstatus", "o_orderpriority")
      .agg(
        grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_prio"),
        count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        col("g_status"), col("g_prio"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy("g_status", "g_prio", "status", "priority")
  }

  private val aggCube: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    li.cube("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"),
        count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        col("g_rf"), col("g_ls"),
        coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy("g_rf", "g_ls", "rf", "ls")
  }

  /** GROUPING SETS via the SQL surface (also exercises spark.sql + views). */
  private val aggGroupingSets: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(s"""
      SELECT grouping(o_orderstatus) AS g_status,
             grouping(o_custkey)     AS g_cust,
             coalesce(o_orderstatus, '(all)') AS status,
             coalesce(CAST(o_custkey AS STRING), '(all)') AS custkey,
             count(1) AS n, ${Det.oSum("o_totalprice")} AS sum_price
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_custkey), ())
      ORDER BY g_status, g_cust, status, custkey""")
  }

  // --------------------------------------------------------- sort / limit

  /** Global top-N: Spark plans TakeOrderedAndProject — no full sort, no
    * single-node shuffle of the whole table.
    */
  private val sortLimit: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** Top-k per group via row_number window + filter. */
  private val topkPerGroup: Q = (s, dir) => {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables(s, dir, "part")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("p_brand", "rk", "p_partkey", "p_retailprice")
      .orderBy("p_brand", "rk")
  }

  /** Same result via the TypedImperativeAggregate topk_by_value
    * ([[org.apache.spark.sql.graft.TopKByValue]]): bounded heaps as
    * partial aggregation state, so each map partition ships at most k
    * rows per group — no per-group full sort, the formulation that wins
    * when groups are huge. Oracle identical to the window version.
    */
  private val topkPerGroupAgg: Q = (s, dir) => {
    import org.apache.spark.sql.graft.TopKAgg.topk_by_value
    Tables(s, dir, "part")
      .groupBy("p_brand")
      .agg(topk_by_value(col("p_retailprice").cast("double"),
        col("p_partkey").cast("long"), 3).as("top"))
      .select(col("p_brand"), posexplode(col("top")))
      .select(col("p_brand"), (col("pos") + 1).as("rk"),
        col("col.key").as("p_partkey"), col("col.val").as("p_retailprice"))
      .orderBy("p_brand", "rk")
  }

  /** Correlated scalar subquery through the SQL surface: Catalyst
    * decorrelates it into an aggregate + join (no per-row re-execution).
    * The inner average goes through the decimal route so the comparison
    * boundary is identical in both engines.
    */
  private val sqlCorrelatedSubquery: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_sq")
    s.sql(s"""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders_sq o
      WHERE o_totalprice > 2 * (
        SELECT ${Det.oAvg("o2.o_totalprice")}
        FROM orders_sq o2 WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")
  }

  /** collect_list / collect_set surfaced deterministically: sorted and
    * re-joined to strings so the compare is representation-free.
    */
  private val aggCollect: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    li.groupBy("l_returnflag")
      .agg(
        concat_ws(",", array_sort(collect_set(col("l_linestatus")))).as("statuses"),
        expr("cast(size(collect_list(l_linestatus)) as bigint)").as("n_vals"),
        concat_ws(",", array_sort(collect_set(col("l_linenumber").cast("string")))).as("line_nos"))
      .orderBy("l_returnflag")
  }

  /** Exact percentiles (sort-based `percentile`, linear interpolation —
    * same definition as the oracle's quantile_cont) plus the approximate
    * sketch variant for the plan shape comparison. Values round(.,6) to
    * absorb interpolation-arithmetic ulps.
    */
  private val aggPercentile: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    li.groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99"),
        round(min(col("l_extendedprice")), 6).as("p0"),
        round(max(col("l_extendedprice")), 6).as("p100"))
      .orderBy("l_returnflag")
  }

  /** Exact global percentiles with NO unbounded aggregate state, NO
    * global sort, and NO full-table shuffle — distributed selection by
    * histogram pruning (the two-phase text_length_clip discipline
    * applied to rank selection). Spark's `percentile` (agg_percentile)
    * buffers every value per group; a global rank window single-task
    * sorts the table; even a range-exchange ranking pass moves every
    * row. This plan moves NOTHING but aggregates:
    *
    *  1. one map-side-combining pass for (min, max, n);
    *  2. one map-side-combining pass for a 1024-bucket value histogram
    *     (bucketing is any monotone function of v — equal values land in
    *     one bucket, so selected VALUES are bucketing-independent);
    *  3. the ≤1024-row histogram prefix-sums on a bounded window, and
    *     each percentile's target positions — computed with INTEGER
    *     arithmetic (pos·100 = p100·(n−1), so the straddling ranks and
    *     the interpolation weight m are exact ints, no float position to
    *     drift cross-engine) — locate their bucket in the broadcast
    *     cumulative histogram;
    *  4. straddle-bucket rows COLLAPSE to (distinct value, multiplicity)
    *     in a map-side-combining aggregate (equal values interchange
    *     freely at rank boundaries), sub-bucketed one recursion level on
    *     the bucket's own range; the rank-locating windows run over the
    *     collapsed distinct-value table, partitioned by (bucket,
    *     sub-bucket), and below-counts lift local spans to global ranks.
    *
    * At 100 TB: three scans, windows only over bounded distinct-value
    * tables. Degenerate skew (99% one value) is the collapse's case: the
    * hot value is ONE dv row at any multiplicity, so no window ever sees
    * its row count — the one-level row-ranking formulation funneled ~n
    * rows into ONE window task exactly when the data was worst
    * (PropertySpec pins the bound on a 99%-constant column). Verified
    * against Spark's own `percentile` in RoundEightOpsSpec (≤1e-4, the
    * built-in computes its position in floating point).
    */
  /** Monotone 1024-cell value bucketing for the histogram-selection
    * percentile family — equal values share a bucket, so selected VALUES
    * are bucketing-independent; the all-equal guard avoids 0/0.
    */
  private[operators] def histBucket(v: Column, nb: Int): Column =
    when(col("mx") === col("mn"), lit(0L)).otherwise(
      least(floor((v - col("mn")) / ((col("mx") - col("mn")) / nb)), lit(nb - 1L))
        .cast("long"))

  /** The same monotone nb-cell bucketing over an EXPLICIT [lo, hi] range
    * — the sub-bucket (recursion) level of the selection substrate,
    * shared by the global, grouped and weighted variants so the
    * zero-width guard and the top-cell cap live in exactly one place.
    */
  private[operators] def subBucket(v: Column, lo: Column, hi: Column, nb: Int): Column =
    when(hi === lo, lit(0L)).otherwise(
      least(floor((v - lo) / ((hi - lo) / nb)), lit(nb - 1L)).cast("long"))

  /** The histogram-selection engine behind the exact-percentile family —
    * exposed for the property gate (PropertySpec drives it over skewed /
    * duplicate-heavy generated data). Input: column `v` (double); any
    * other columns are ignored (the selection is value-collapsed, so no
    * row tiebreak exists to matter). Output: (pct, n, value) per
    * requested integer percentile, interpolated like `percentile()`
    * with exact integer positions.
    */
  private[graft] def histogramSelect(
      data: DataFrame, pcts: Seq[Int], nb: Int = 1024,
      cacheKey: Option[(SparkSession, String, String)] = None): DataFrame =
    histogramSelectParts(data, pcts, nb, cacheKey)._1

  /** [[histogramSelect]] plus its window-INPUT frame (the collapsed
    * distinct-value table `dv`), exposed so the property gate can pin
    * the degenerate-skew bound: PropertySpec drives a 99%-one-value
    * column and asserts no window partition exceeds the sub-bucket
    * distinct-value bound.
    *
    * Two defenses close the old single-level hole (a dominant value
    * concentrating ~n rows into ONE rank-window task):
    *  - DISTINCT-VALUE COLLAPSE: equal values interchange freely at any
    *    rank boundary, so selection needs only (value, multiplicity);
    *    straddle-bucket rows collapse by exact value in a map-side-
    *    combining aggregate BEFORE any window — duplicate mass (the
    *    skew) never reaches a window partition at all;
    *  - one RECURSION level: straddle buckets re-histogram into nb
    *    sub-buckets on their own [min, max] (riding the level-1
    *    histogram pass), so window partitions are bounded by
    *    distinct-values-per-1/nb² of the value domain even on
    *    adversarial all-distinct concentrated columns.
    * Cost: one extra bounded window (sub-bucket totals); the dv branch
    * reuses one exchange for both consumers.
    */
  private[graft] def histogramSelectParts(
      data: DataFrame, pcts: Seq[Int], nb: Int = 1024,
      cacheKey: Option[(SparkSession, String, String)] = None): (DataFrame, DataFrame) = {
    // the tiny derived frames (1-row moments, ≤1024-row histogram prefix,
    // ≤2·pcts locator rows, collapsed dv) are cached: each is referenced
    // by 2+ downstream branches, and without the cache every reference
    // re-executes its whole subplan — 28 base-table scans in the
    // uncached plan vs 3 with it. Production queries pass a (session,
    // dir, name) cacheKey so repeated executions (min-of-2 bench passes,
    // determinism double-runs) REUSE one Cached.of entry per query
    // instead of leaking a fresh persist() set per invocation; ad-hoc
    // callers (the property gate) fall back to plain persist.
    def keep(tag: String)(df: DataFrame): DataFrame = cacheKey match {
      case Some((s, d, k)) => graft.Cached.of(s, d, s"$k.$tag")(df)
      case None => df.persist()
    }
    val mm = keep("mm")(
      data.agg(min(col("v")).as("mn"), max(col("v")).as("mx"), count(lit(1)).as("n")))
    val withB = data.crossJoin(broadcast(mm)).withColumn("b", histBucket(col("v"), nb))
    // per-bucket min/max ride the same map-side-combining pass as cnt —
    // they define the sub-bucket (level-2) value ranges
    val hist = withB.groupBy("b").agg(count(lit(1)).as("cnt"),
      min(col("v")).as("bmn"), max(col("v")).as("bmx"))
    val cum = hist.withColumn("below", coalesce(
        sum(col("cnt")).over(Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // each percentile -> up to 2 straddling global ranks (lo, lo+1)
    val specs = mm.select(
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("p100"), col("n"))
      .withColumn("pos100", col("p100") * (col("n") - 1))
      .withColumn("lo", expr("pos100 div 100 + 1"))
      .withColumn("m", expr("pos100 % 100"))
      .select(col("p100"), col("n"), col("m"),
        explode(array(col("lo"), col("lo") + 1)).as("r"))
      .filter(col("r") <= col("n"))
    val specsK = keep("specs")(specs)
    val located = keep("located")(specsK.join(broadcast(cum),
      col("r") > col("below") && col("r") <= col("below") + col("cnt")))
    val buckets = located
      .select(col("b"), col("below"), col("bmn"), col("bmx")).distinct()
    // DISTINCT-VALUE COLLAPSE: equal values interchange freely at any
    // rank boundary, so selection only ever needs (value, multiplicity) —
    // the map-side-combining groupBy below absorbs duplicate mass BEFORE
    // any window. A 99%-one-value bucket collapses to a handful of dv
    // rows; no window ever sees the hot value's row count. The sub-bucket
    // key b2 (the one recursion level, on the bucket's own [min, max])
    // additionally bounds window partitions for the adversarial
    // all-DISTINCT concentrated bucket by distinct-values-per-1/nb² of
    // the value domain.
    val dv = keep("dv")(withB.join(broadcast(buckets), "b")
      .withColumn("b2", subBucket(col("v"), col("bmn"), col("bmx"), nb))
      .groupBy("b", "below", "b2", "v").agg(count(lit(1)).as("cv")))
    // sub-bucket totals (≤ nb·|straddle buckets| rows) → per-sub-bucket
    // rank offsets over the cached dv
    val cum2 = dv.groupBy("b", "b2").agg(sum(col("cv")).as("cnt2"))
      .withColumn("below2", coalesce(
        sum(col("cnt2")).over(Window.partitionBy("b").orderBy("b2")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("b2"), col("below2"))
    val cumv = dv.join(broadcast(cum2), Seq("b", "b2"))
      .withColumn("below_v", col("below") + col("below2") + coalesce(
        sum(col("cv")).over(Window.partitionBy("b", "b2").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // global rank r lands on the distinct value whose cumulative span
    // covers it: below_v < r ≤ below_v + cv
    val picked = cumv.join(
        broadcast(located.select(col("p100"), col("n").as("n_"), col("m"),
          col("r"), col("b").as("b_"))),
        col("b") === col("b_") && col("r") > col("below_v") &&
          col("r") <= col("below_v") + col("cv"))
      .select(col("p100"), col("n_"), col("m"), col("r").as("gr"), col("v"))
    val lom = specsK.groupBy("p100").agg(min(col("r")).as("lo"))
    val res = picked.join(broadcast(lom), "p100")
      .groupBy("p100")
      .agg(max(col("n_")).as("n"),
        max(when(col("gr") === col("lo"), col("v"))).as("vlo"),
        max(when(col("gr") === col("lo") + 1, col("v"))).as("vhi"),
        max(col("m")).as("m"))
      .select(
        (col("p100").cast("double") / 100.0).as("pct"),
        col("n"),
        round(col("vlo") +
          (col("m") * (coalesce(col("vhi"), col("vlo")) - col("vlo"))) / 100.0, 6).as("value"))
      .orderBy("pct")
    (res, dv)
  }

  private val aggPercentileDist: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem").select(col("l_extendedprice").as("v"))
    histogramSelect(li, Seq(50, 90, 99), cacheKey = Some((s, dir, "pct.dist")))
  }

  /** Robust means — winsorized (values clipped to [p05, p95]) and
    * trimmed (values outside dropped) — COMPOSING the histogram-selection
    * substrate (exact interpolated fences, no sort, no unbounded state)
    * with one clipped map-side-combining aggregate over the broadcast
    * 2-value fence row. Sums route through DECIMAL(25,6) (the dsum
    * discipline) so the means are merge-order-free; one IEEE division +
    * round(6) each. At 100 TB: the substrate's three scans + one more —
    * the standard robust-statistics pass no built-in covers exactly.
    */
  private val aggRobustMean: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem").select(col("l_extendedprice").as("v"))
    val fences = histogramSelect(li, Seq(5, 95), cacheKey = Some((s, dir, "pct.robust")))
      .agg(max(when(col("pct") === 0.05, col("value"))).as("p05"),
        max(when(col("pct") === 0.95, col("value"))).as("p95"))
    li.crossJoin(broadcast(fences))
      .agg(count(lit(1)).as("n"),
        max(col("p05")).as("p05"), max(col("p95")).as("p95"),
        (sum(least(greatest(col("v"), col("p05")), col("p95"))
          .cast("decimal(25,6)")).cast("double") / count(lit(1))).as("wm"),
        (sum(when(col("v").between(col("p05"), col("p95")), col("v"))
          .cast("decimal(25,6)")).cast("double") /
          count(when(col("v").between(col("p05"), col("p95")), lit(1)))).as("tm"))
      .select(col("n"), col("p05"), col("p95"),
        round(col("wm"), 6).as("winsorized_mean"),
        round(col("tm"), 6).as("trimmed_mean"))
  }

  /** PER-GROUP exact percentiles by histogram selection — the "p99 per
    * endpoint" query every latency dashboard runs, exact, with bounded
    * state (the built-in `percentile` buffers every group value;
    * approx_percentile answers it only within rank ε). Same substrate
    * as [[aggPercentileDist]] with the group key threaded through every
    * step: a (group × 1024)-row count histogram, per-group cumulative
    * offsets on a bounded window, integer target positions, and the
    * distinct-value-collapse rank location over only the straddle
    * buckets, PARTITIONED by (group, bucket) so parallelism scales with
    * groups × buckets and a 90%-one-value group contributes ONE collapsed
    * row for its hot value. Interpolation matches `percentile`'s
    * definition with exact integer positions. At 100 TB: three
    * map-side-combining scans + windows over bounded distinct-value
    * tables — no group ever concentrates on one task.
    */
  private val aggPercentileGrouped: Q = (s, dir) => {
    val nb = 1024
    val li = Tables(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    // multi-referenced tiny frames session-cached (see histogramSelectParts)
    val mm = graft.Cached.of(s, dir, "pct.grp.mm")(li.groupBy("g")
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"), count(lit(1)).as("n")))
    val withB = li.join(broadcast(mm), "g")
      .withColumn("b", histBucket(col("v"), nb))
    val hist = withB.groupBy("g", "b").agg(count(lit(1)).as("cnt"),
      min(col("v")).as("bmn"), max(col("v")).as("bmx"))
    val cum = hist.withColumn("below", coalesce(
        sum(col("cnt")).over(Window.partitionBy("g").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val specs = mm.select(col("g"), col("n"),
        explode(array(lit(50L), lit(90L), lit(99L))).as("p100"))
      .withColumn("pos100", col("p100") * (col("n") - 1))
      .withColumn("lo", expr("pos100 div 100 + 1"))
      .withColumn("m", expr("pos100 % 100"))
      .select(col("g"), col("p100"), col("n"), col("m"),
        explode(array(col("lo"), col("lo") + 1)).as("r"))
      .filter(col("r") <= col("n"))
    val specsK = graft.Cached.of(s, dir, "pct.grp.specs")(specs)
    val located = graft.Cached.of(s, dir, "pct.grp.located")(
      specsK.join(broadcast(cum.withColumnRenamed("g", "g_")),
        col("g") === col("g_") &&
          col("r") > col("below") && col("r") <= col("below") + col("cnt"))
        .drop("g_"))
    // DISTINCT-VALUE COLLAPSE + one sub-bucket level (the FULL
    // histogramSelectParts degenerate-skew defense, group-keyed):
    // straddle-bucket rows collapse to (value, multiplicity) map-side
    // BEFORE any window — a group where one value holds 90% of the rows
    // contributes ONE dv row for it — and sub-bucketing on the bucket's
    // own [min, max] bounds window partitions by
    // distinct-values-per-1/nb² even on all-distinct concentrated groups
    val buckets = located
      .select(col("g"), col("b"), col("below"), col("bmn"), col("bmx")).distinct()
    val dv = graft.Cached.of(s, dir, "pct.grp.dv")(
      withB.join(broadcast(buckets), Seq("g", "b"))
        .withColumn("b2", subBucket(col("v"), col("bmn"), col("bmx"), nb))
        .groupBy("g", "b", "below", "b2", "v").agg(count(lit(1)).as("cv")))
    val cum2 = dv.groupBy("g", "b", "b2").agg(sum(col("cv")).as("cnt2"))
      .withColumn("below2", coalesce(
        sum(col("cnt2")).over(Window.partitionBy("g", "b").orderBy("b2")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("g"), col("b"), col("b2"), col("below2"))
    val cumv = dv.join(broadcast(cum2), Seq("g", "b", "b2"))
      .withColumn("below_v", col("below") + col("below2") + coalesce(
        sum(col("cv")).over(Window.partitionBy("g", "b", "b2").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val picked = cumv.join(
        broadcast(located.select(col("g").as("gg"), col("p100"),
          col("n").as("n_"), col("m"), col("r"))),
        col("g") === col("gg") && col("r") > col("below_v") &&
          col("r") <= col("below_v") + col("cv"))
      .select(col("g"), col("p100"), col("n_"), col("m"),
        col("r").as("gr"), col("v"))
    val lom = specsK.groupBy("g", "p100").agg(min(col("r")).as("lo"))
    picked.join(broadcast(lom), Seq("g", "p100"))
      .groupBy("g", "p100")
      .agg(max(col("n_")).as("n"),
        max(when(col("gr") === col("lo"), col("v"))).as("vlo"),
        max(when(col("gr") === col("lo") + 1, col("v"))).as("vhi"),
        max(col("m")).as("m"))
      .select(col("g").as("l_returnflag"),
        (col("p100").cast("double") / 100.0).as("pct"), col("n"),
        round(col("vlo") +
          (col("m") * (coalesce(col("vhi"), col("vlo")) - col("vlo"))) / 100.0, 6)
          .as("value"))
      .orderBy("l_returnflag", "pct")
  }

  /** WEIGHTED exact percentiles (weight = line quantity) by the same
    * histogram-selection substrate as [[aggPercentileDist]] — the
    * "median order value by units sold" class of question, which no
    * built-in covers exactly. Type-1 weighted quantile: the p-quantile
    * is the smallest v whose cumulative weight reaches p·W, located with
    * pure INTEGER comparisons (cumw·100 ≥ p100·W — no float target).
    * The weight histogram replaces the count histogram; straddle-bucket
    * rows collapse to (distinct value, Σweight) before the per-bucket
    * cumulative-weight window. Same scale posture: three
    * map-side-combining scans, windows only over collapsed value tables.
    */
  private val aggPercentileWeighted: Q = (s, dir) => {
    val nb = 1024
    val li = Tables(s, dir, "lineitem")
      .select(col("l_extendedprice").as("v"),
        expr("cast(round(l_quantity) as bigint)").as("w"))
    // multi-referenced tiny frames session-cached (see histogramSelectParts)
    val mm = graft.Cached.of(s, dir, "pct.w.mm")(
      li.agg(min(col("v")).as("mn"), max(col("v")).as("mx"), sum(col("w")).as("tw")))
    val hist = li.crossJoin(broadcast(mm))
      .withColumn("b", histBucket(col("v"), nb))
      .groupBy("b").agg(sum(col("w")).as("bw"),
        min(col("v")).as("bmn"), max(col("v")).as("bmx"))
    val cum = hist.withColumn("below", coalesce(
        sum(col("bw")).over(Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val specs = mm.select(explode(array(lit(50L), lit(90L), lit(99L))).as("p100"), col("tw"))
      .withColumn("t100", col("p100") * col("tw"))
    val located = graft.Cached.of(s, dir, "pct.w.located")(
      specs.join(broadcast(cum),
        col("t100") > col("below") * 100 &&
          col("t100") <= (col("below") + col("bw")) * 100))
    val buckets = located
      .select(col("b"), col("below"), col("bmn"), col("bmx")).distinct()
    // DISTINCT-VALUE COLLAPSE + one sub-bucket level (the FULL
    // histogramSelectParts degenerate-skew defense, weighted):
    // straddle-bucket rows collapse to (value, Σweight) map-side — a
    // dominant value is one dv row at any multiplicity — and the
    // cumulative-weight windows run per (bucket, sub-bucket) over
    // distinct values only; the type-1 pick (smallest v whose global
    // cumulative weight reaches the target) is unchanged because equal
    // values share one cumulative span and cw stays globally offset
    val dv = graft.Cached.of(s, dir, "pct.w.dv")(
      li.crossJoin(broadcast(mm))
        .withColumn("b", histBucket(col("v"), nb))
        .join(broadcast(buckets), "b")
        .withColumn("b2", subBucket(col("v"), col("bmn"), col("bmx"), nb))
        .groupBy("b", "below", "b2", "v").agg(sum(col("w")).as("wv")))
    val cum2 = dv.groupBy("b", "b2").agg(sum(col("wv")).as("w2"))
      .withColumn("below2", coalesce(
        sum(col("w2")).over(Window.partitionBy("b").orderBy("b2")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("b2"), col("below2"))
    val cumv = dv.join(broadcast(cum2), Seq("b", "b2"))
      .withColumn("cw", col("below") + col("below2") + sum(col("wv")).over(
        Window.partitionBy("b", "b2").orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cumv.join(
        broadcast(located.select(col("p100").as("p_"), col("t100"), col("tw").as("tw_"),
          col("b").as("b_"))),
        col("b") === col("b_") && col("cw") * 100 >= col("t100"))
      .groupBy("p_")
      .agg(max(col("tw_")).as("w_total"), min(col("v")).as("vmin"))
      .select((col("p_").cast("double") / 100.0).as("pct"), col("w_total"),
        round(col("vmin"), 6).as("value"))
      .orderBy("pct")
  }

  /** approx_percentile (Greenwald-Khanna summaries, accuracy=100 → rank
    * error ε=1%). Same verification pattern as agg_approx_distinct: the
    * sketch VALUE depends on merge order, so the hash-verified contract
    * is GK's rank guarantee — the exact rank of the approximate p90
    * (recomputed with one aggregation join-back) must sit within ε·n of
    * the target rank. The oracle recomputes n and asserts TRUE; a sketch
    * drifting past its guarantee flips the hash. Mergeable-summary
    * state is O(1/ε · log εn) per group per partition — the property
    * that lets a 100 TB percentile run as one map-side-combining pass
    * (vs exact `agg_percentile`, whose sort-based state is unbounded).
    */
  private val aggApproxQuantile: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val ap = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.9, 100)").as("v"),
        count(lit(1)).as("n"))
    li.select(col("l_returnflag"), col("l_extendedprice"))
      .join(ap, Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("l_extendedprice") <= col("v"), 1L).otherwise(0L)).as("rank_v"),
        first(col("n")).as("n"))
      .select(col("l_returnflag"), col("n"),
        (abs(col("rank_v").cast("double") - col("n") * 0.9) <=
          col("n") * 0.011 + 1).as("rank_within_eps"))
      .orderBy("l_returnflag")
  }

  // ------------------------------------------------------------ skew guards

  /** Two-phase salted aggregation over the skewed events.user_id key
    * (few users, many events): phase 1 aggregates (user, salt) so every
    * core shares the hot keys' work; phase 2 merges the 8 partials per
    * user. Decimal partials keep the final double bit-exact vs the
    * oracle's direct GROUP BY.
    */
  private val aggSkewSalted: Q = (s, dir) => {
    val e = Tables(s, dir, "events")
    e.withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy("user_id", "salt")
      .agg(sum(col("value").cast(Det.Scale)).as("psum"), count(lit(1)).as("pn"))
      .groupBy("user_id")
      .agg(sum(col("psum")).cast("double").as("sum_value"), sum(col("pn")).as("n"))
      .orderBy("user_id")
  }

  /** Skew-aware salted join: the big (skewed) side gets a salt column,
    * the small side is replicated across all 8 salt values, and the join
    * key becomes (key, salt) — the hot key's rows now land on 8
    * partitions instead of one. AQE's skew-join does this adaptively;
    * this operator is the explicit, planner-independent form.
    */
  private val joinSkewSalted: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(8)))
    val users = Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(sequence(lit(0), lit(7))))
    ev.join(users,
        ev("user_id") === users("c_custkey") && ev("salt") === users("salt"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("c_mktsegment")
  }

  // ---------------------------------------------------------------- set ops

  private def custkeysByStatus(s: SparkSession, dir: String, st: String) =
    Tables(s, dir, "orders").filter(col("o_orderstatus") === st)
      .select(col("o_custkey"))

  private val setUnion: Q = (s, dir) =>
    custkeysByStatus(s, dir, "F").union(custkeysByStatus(s, dir, "O"))
      .distinct().orderBy("o_custkey")

  private val setIntersect: Q = (s, dir) =>
    custkeysByStatus(s, dir, "F").intersect(custkeysByStatus(s, dir, "O"))
      .orderBy("o_custkey")

  private val setExcept: Q = (s, dir) =>
    custkeysByStatus(s, dir, "F").except(custkeysByStatus(s, dir, "O"))
      .orderBy("o_custkey")

  /** Multiset variants: EXCEPT ALL / INTERSECT ALL keep duplicate
    * multiplicity (Spark plans these as a specialized aggregate over
    * per-row counts — one shuffle, no join).
    */
  private val setExceptAll: Q = (s, dir) =>
    custkeysByStatus(s, dir, "F").exceptAll(custkeysByStatus(s, dir, "O"))
      .orderBy("o_custkey")

  private val setIntersectAll: Q = (s, dir) =>
    custkeysByStatus(s, dir, "F").intersectAll(custkeysByStatus(s, dir, "O"))
      .orderBy("o_custkey")

  /** Arg-max/arg-min aggregates (max_by/min_by) plus count_if. The by-key
    * is made UNIQUE per group (exact decimal price scaled + orderkey) so
    * ties cannot make the winner engine-dependent. `uk` is integral by
    * construction (price has scale 2, scaled by 1e9), so the output is
    * cast to BIGINT on both sides — Spark and DuckDB assign different
    * decimal precision/scale to the same arithmetic, which drifts the
    * hashed string form even when values are numerically equal.
    */
  private val aggMinmaxBy: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .withColumn("uk",
        expr("cast(l_extendedprice as decimal(20,2)) * 1000000000 + l_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        expr("max_by(l_orderkey, uk)").as("top_order"),
        expr("min_by(l_orderkey, uk)").as("bottom_order"),
        expr("cast(count_if(l_discount > 0.05) as bigint)").as("n_discounted"),
        expr("cast(max(uk) as bigint)").as("max_uk"))
      .orderBy("l_returnflag")
  }

  // ------------------------------------------------------------------- maps

  /** Mergeable distinct-count sketch: the custom KMV
    * [[org.apache.spark.sql.graft.KmvDistinct TypedImperativeAggregate]]
    * (k=64 smallest md5-derived 60-bit hashes) next to the exact count.
    * Unlike approx_count_distinct's HLL registers, the KMV state is
    * purely set-determined, so the DuckDB oracle replays the sketch
    * exactly (sort distinct hashes, apply the same estimator) — a
    * hash-verified approximate aggregate. Constant k-long state per
    * group per partition flows through the exchange at 100 TB.
    */
  private val aggKmvDistinct: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .withColumn("h",
        expr("cast(conv(substr(md5(cast(l_partkey as string)), 1, 15), 16, 10) as bigint)"))
      .groupBy("l_returnflag")
      .agg(kmv_distinct(col("h"), 64).as("kmv_raw"),
        countDistinct(col("h")).as("exact_nd"))
      .select(col("l_returnflag"), round(col("kmv_raw"), 4).as("kmv_est"),
        col("exact_nd"))
      .orderBy("l_returnflag")
  }

  /** The KMV sketch under ROLLUP — the mergeability proof in query form:
    * Spark's rollup plans one Expand feeding the same
    * TypedImperativeAggregate, whose partial TreeSet states merge by set
    * union across every hierarchy level, and the DuckDB oracle replays
    * all three levels exactly. At 100 TB this is how one pass yields
    * distinct-count sketches at every granularity of a cube.
    */
  private val aggKmvRollup: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .withColumn("h",
        expr("cast(conv(substr(md5(cast(l_partkey as string)), 1, 15), 16, 10) as bigint)"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(kmv_distinct(col("h"), 64).as("kmv_raw"),
        countDistinct(col("h")).as("exact_nd"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        round(col("kmv_raw"), 4).as("kmv_est"), col("exact_nd"))
      .orderBy("rf", "ls")
  }

  /** Exact per-group distinct count via fixed-width bitmap words: key k sets
    * bit (k & 31) of word (k >> 5); words OR-combine map-side (bit_or is
    * associative-commutative), so the shuffle carries at most domain/32
    * bitmap words per group instead of every raw key — the dense-int-domain
    * counterpart to the KMV sketch above, but exact. popcount-sum folds the
    * words to the count. The identical shift/mask arithmetic runs in DuckDB
    * (32-bit packing: a shift of 63 overflows DuckDB's checked signed `<<`).
    */
  private val aggBitmapDistinct: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("shiftright(l_partkey, 5)").as("wd"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(l_partkey % 32 AS INT))").as("b"))
      .groupBy("l_returnflag", "wd")
      .agg(expr("bit_or(b)").as("m"))
      .groupBy("l_returnflag")
      .agg(expr("CAST(SUM(bit_count(m)) AS BIGINT)").as("nd_bitmap"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "agg_bitmap_distinct" -> aggBitmapDistinct,
    "filter_pushdown" -> filterPushdown,
    "join_inner_hash" -> joinInnerHash,
    "join_sortmerge" -> joinSortMerge,
    "join_shuffle_hash" -> joinShuffleHash,
    "join_null_safe" -> joinNullSafe,
    "agg_multi_distinct" -> aggMultiDistinct,
    "join_left" -> joinLeft,
    "join_full" -> joinFull,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_theta" -> joinTheta,
    "join_range_binned" -> joinRangeBinned,
    "join_interval_overlap" -> joinIntervalOverlap,
    "agg_hll_union" -> aggHllUnion,
    "agg_cms_heavy" -> aggCmsHeavy,
    "sketch_kmv_setops" -> sketchKmvSetops,
    "sql_skyline_pareto" -> skylinePareto,
    "agg_hash" -> aggHash,
    "agg_distinct" -> aggDistinct,
    "agg_approx_distinct" -> aggApproxDistinct,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "agg_grouping_sets" -> aggGroupingSets,
    "sort_limit" -> sortLimit,
    "topk_per_group" -> topkPerGroup,
    "topk_per_group_agg" -> topkPerGroupAgg,
    "set_union" -> setUnion,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "set_except_all" -> setExceptAll,
    "set_intersect_all" -> setIntersectAll,
    "agg_minmax_by" -> aggMinmaxBy,
    "agg_kmv_distinct" -> aggKmvDistinct,
    "agg_kmv_rollup" -> aggKmvRollup,
    "agg_skew_salted" -> aggSkewSalted,
    "join_skew_salted" -> joinSkewSalted,
    "agg_percentile" -> aggPercentile,
    "agg_percentile_dist" -> aggPercentileDist,
    "agg_robust_mean" -> aggRobustMean,
    "agg_percentile_weighted" -> aggPercentileWeighted,
    "agg_percentile_grouped" -> aggPercentileGrouped,
    "agg_approx_quantile" -> aggApproxQuantile,
    "sql_correlated_subquery" -> sqlCorrelatedSubquery,
    "agg_collect" -> aggCollect,
  )

  val oracles: Map[String, String] = Map(
    // the oracle recomputes the exact ND and asserts the accuracy claim —
    // see aggApproxDistinct's doc for why the estimate itself isn't pinned
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_nd_part,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // the O(n^2) textbook definition — dominance anti-join
    "sql_skyline_pareto" ->
      """WITH pts AS (
        |  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
        |    o_orderdate AS od, CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT a.price_cents, strftime(a.od, '%Y-%m-%d') AS order_day, a.n_orders
        |FROM pts a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts b
        |  WHERE b.price_cents <= a.price_cents AND b.od >= a.od
        |    AND (b.price_cents < a.price_cents OR b.od > a.od))
        |ORDER BY a.price_cents""".stripMargin,
    // exact sketch replay: bottom-64 per segment, KMV merge + estimators
    "sketch_kmv_setops" ->
      """WITH s AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS seg, l_partkey
        |  FROM lineitem WHERE strftime(l_shipdate, '%Y-%m') IN ('1995-01', '1995-02')),
        |h AS (
        |  SELECT DISTINCT seg AS f,
        |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM s),
        |ra AS (SELECT h FROM h WHERE f = '1995-01' ORDER BY h LIMIT 64),
        |rb AS (SELECT h FROM h WHERE f = '1995-02' ORDER BY h LIMIT 64),
        |m AS (SELECT h FROM (SELECT h FROM ra UNION SELECT h FROM rb) ORDER BY h LIMIT 64),
        |st AS (SELECT (SELECT COUNT(*) FROM m) AS msz, (SELECT MAX(h) FROM m) AS kth,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m JOIN ra USING (h) JOIN rb USING (h)) AS matches),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
        |  CAST(COUNT(*) FILTER (WHERE ia = 1 AND ib = 1) AS BIGINT) AS exact_inter
        |  FROM (SELECT l_partkey,
        |      MAX(CASE WHEN seg = '1995-01' THEN 1 ELSE 0 END) AS ia,
        |      MAX(CASE WHEN seg = '1995-02' THEN 1 ELSE 0 END) AS ib
        |    FROM s GROUP BY 1)),
        |u AS (SELECT CASE WHEN msz < 64 THEN CAST(msz AS DOUBLE)
        |    ELSE 63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE) END AS u_est,
        |  matches, CAST(matches AS DOUBLE) / CAST(msz AS DOUBLE) AS jacc FROM st)
        |SELECT CAST(64 AS BIGINT) AS k, matches, round(u_est, 4) AS union_est,
        |  jacc, round(jacc * u_est, 4) AS inter_est, exact_union, exact_inter
        |FROM u, ex""".stripMargin,
    // CMS guarantee claims (see Scaladoc): never undercounts, overcount <= eps*N
    "agg_cms_heavy" ->
      """SELECT l_returnflag, l_suppkey, COUNT(*) AS true_cnt,
        |  TRUE AS no_undercount, TRUE AS within_eps
        |FROM lineitem WHERE l_suppkey BETWEEN 1 AND 5
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same accuracy-claim contract as agg_approx_distinct (see Scaladoc)
    "agg_hll_union" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_nd_part,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // the naive overlap theta — semantically identical to the bin join
    "join_interval_overlap" ->
      s"""WITH m AS (SELECT DISTINCT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
         |             AS audit_month
         |           FROM lineitem),
         |x AS (SELECT l_quantity, l_extendedprice, l_discount, l_shipdate,
         |        l_shipdate + (l_orderkey % 45 + 1) * INTERVAL 1 DAY AS t_end
         |      FROM lineitem)
         |SELECT m.audit_month, COUNT(*) AS n_overlap,
         |  ${oSum("l_quantity")} AS sum_qty,
         |  ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM x JOIN m ON x.l_shipdate < m.audit_month + INTERVAL 1 MONTH
         |              AND x.t_end >= m.audit_month
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_approx_quantile" ->
      """SELECT l_returnflag, COUNT(*) AS n, TRUE AS rank_within_eps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_kmv_rollup" ->
      """WITH h0 AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |g AS (SELECT rf, ls, h FROM h0
        |  UNION ALL SELECT rf, '(all)', h FROM h0
        |  UNION ALL SELECT '(all)', '(all)', h FROM h0),
        |d AS (SELECT DISTINCT rf, ls, h FROM g),
        |r AS (SELECT rf, ls, h,
        |    row_number() OVER (PARTITION BY rf, ls ORDER BY h) AS rk,
        |    COUNT(*) OVER (PARTITION BY rf, ls) AS nd
        |  FROM d)
        |SELECT rf, ls,
        |  round(CASE WHEN MAX(nd) < 64 THEN CAST(MAX(nd) AS DOUBLE)
        |    ELSE 63.0 * 1152921504606846976.0 / MAX(CASE WHEN rk = 64 THEN h END)
        |    END, 4) AS kmv_est,
        |  CAST(MAX(nd) AS BIGINT) AS exact_nd
        |FROM r GROUP BY rf, ls ORDER BY rf, ls""".stripMargin,
    "agg_bitmap_distinct" ->
      """WITH w AS (
        |  SELECT l_returnflag, l_partkey >> 5 AS wd,
        |    bit_or(CAST(1 AS BIGINT) << CAST(l_partkey % 32 AS INT)) AS m
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, CAST(SUM(bit_count(m)) AS BIGINT) AS nd_bitmap
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        | strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        |FROM lineitem
        |WHERE (l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24
        |  AND l_returnflag IN ('A','N')
        |  AND l_linestatus LIKE '%F%')
        |  OR l_shipdate IS NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_inner_hash" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
         | ${oSum("c_acctbal")} AS sum_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_sortmerge" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_items,
         | ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_shuffle_hash" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         | ${oSum("o_totalprice")} AS sum_total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_null_safe" ->
      """WITH li AS (SELECT l_returnflag,
        |    CASE WHEN l_orderkey % 10 = 0 THEN NULL
        |         ELSE strftime(l_shipdate, '%Y-%m-%d') END AS ship_day
        |  FROM lineitem),
        |a AS (SELECT ship_day, COUNT(*) AS n_a FROM li
        |  WHERE l_returnflag = 'A' GROUP BY 1),
        |r AS (SELECT ship_day, COUNT(*) AS n_r FROM li
        |  WHERE l_returnflag = 'R' GROUP BY 1)
        |SELECT a.ship_day, n_a, n_r FROM a
        |JOIN r ON a.ship_day IS NOT DISTINCT FROM r.ship_day
        |ORDER BY a.ship_day NULLS FIRST""".stripMargin,
    "agg_multi_distinct" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd_part,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
        |  CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS nd_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "join_left" ->
      s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         | ${oSum("COALESCE(o_totalprice, 0.0)")} AS sum_total
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full" ->
      """SELECT COALESCE(s.s_nationkey, c.c_nationkey) AS nationkey,
        | COALESCE(s.n_sup, 0) AS n_sup, COALESCE(c.n_cust, 0) AS n_cust
        |FROM (SELECT s_nationkey, COUNT(*) AS n_sup FROM supplier GROUP BY 1) s
        |FULL JOIN (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |  ON s.s_nationkey = c.c_nationkey
        |ORDER BY nationkey""".stripMargin,
    "join_semi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_theta" ->
      s"""SELECT p_brand, COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN part
         |  ON l_partkey = p_partkey AND l_quantity > p_size
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_range_binned" ->
      s"""SELECT c_custkey, COUNT(*) AS n_near,
         |  ${oSum("o_totalprice")} AS sum_near
         |FROM customer JOIN orders
         |  ON o_totalprice BETWEEN c_acctbal - 100.0 AND c_acctbal + 100.0
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "agg_hash" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${oSum("l_quantity")} AS sum_qty,
         | ${oSum("l_extendedprice")} AS sum_base_price,
         | ${oSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         | ${oSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         | ${oAvg("l_quantity")} AS avg_qty,
         | ${oAvg("l_extendedprice")} AS avg_price,
         | ${oAvg("l_discount")} AS avg_disc,
         | COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
        | COUNT(DISTINCT l_suppkey) AS nd_supp, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      s"""SELECT grouping(o_orderstatus) AS g_status,
         | grouping(o_orderpriority) AS g_prio,
         | COALESCE(o_orderstatus, '(all)') AS status,
         | COALESCE(o_orderpriority, '(all)') AS priority,
         | COUNT(*) AS n, ${oSum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY g_status, g_prio, status, priority""".stripMargin,
    "agg_cube" ->
      s"""SELECT grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
         | COALESCE(l_returnflag, '(all)') AS rf,
         | COALESCE(l_linestatus, '(all)') AS ls,
         | COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY g_rf, g_ls, rf, ls""".stripMargin,
    "agg_grouping_sets" ->
      s"""SELECT grouping(o_orderstatus) AS g_status, grouping(o_custkey) AS g_cust,
         | COALESCE(o_orderstatus, '(all)') AS status,
         | COALESCE(CAST(o_custkey AS VARCHAR), '(all)') AS custkey,
         | COUNT(*) AS n, ${oSum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_custkey), ())
         |ORDER BY g_status, g_cust, status, custkey""".stripMargin,
    "sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "topk_per_group" ->
      """SELECT p_brand, rk, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) t
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "topk_per_group_agg" ->
      """SELECT p_brand, rk, p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice
        |FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) t
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "sql_correlated_subquery" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM orders o
         |WHERE o_totalprice > 2 * (
         |  SELECT ${Det.oAvg("o2.o_totalprice")}
         |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
         |ORDER BY o_orderkey""".stripMargin,
    "agg_collect" ->
      """SELECT l_returnflag,
        | array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
        | COUNT(l_linestatus) AS n_vals,
        | array_to_string(list_sort(list_distinct(list(CAST(l_linenumber AS VARCHAR)))), ',') AS line_nos
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        | round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
        | round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
        | round(min(l_extendedprice), 6) AS p0,
        | round(max(l_extendedprice), 6) AS p100
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_robust_mean" ->
      """WITH v AS (SELECT l_extendedprice AS v FROM lineitem),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM v),
        |n AS (SELECT COUNT(*) AS n FROM v),
        |sp AS (SELECT p100, n, p100 * (n - 1) AS pos100
        |  FROM (VALUES (5), (95)) AS t(p100), n),
        |sp2 AS (SELECT p100, n, pos100 // 100 + 1 AS lo, pos100 % 100 AS m FROM sp),
        |pick AS (SELECT sp2.p100, MAX(sp2.m) AS m,
        |    MAX(CASE WHEN r.r = sp2.lo THEN v END) AS vlo,
        |    MAX(CASE WHEN r.r = sp2.lo + 1 THEN v END) AS vhi
        |  FROM sp2 JOIN r ON r.r BETWEEN sp2.lo AND sp2.lo + 1 GROUP BY 1),
        |f AS (SELECT
        |    MAX(CASE WHEN p100 = 5 THEN round(vlo + (m * (COALESCE(vhi, vlo) - vlo)) / 100.0, 6) END) AS p05,
        |    MAX(CASE WHEN p100 = 95 THEN round(vlo + (m * (COALESCE(vhi, vlo) - vlo)) / 100.0, 6) END) AS p95
        |  FROM pick)
        |SELECT CAST(n.n AS BIGINT) AS n, f.p05 AS p05, f.p95 AS p95,
        |  round(CAST(SUM(CAST(least(greatest(v.v, f.p05), f.p95) AS DECIMAL(25,6))) AS DOUBLE) / n.n, 6) AS winsorized_mean,
        |  round(CAST(SUM(CASE WHEN v.v BETWEEN f.p05 AND f.p95 THEN CAST(v.v AS DECIMAL(25,6)) END) AS DOUBLE)
        |    / COUNT(CASE WHEN v.v BETWEEN f.p05 AND f.p95 THEN 1 END), 6) AS trimmed_mean
        |FROM v, f, n GROUP BY n.n, f.p05, f.p95""".stripMargin,
    "agg_percentile_dist" ->
      """WITH v AS (SELECT l_extendedprice AS v, l_orderkey, l_linenumber FROM lineitem),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, l_orderkey, l_linenumber) AS r FROM v),
        |n AS (SELECT COUNT(*) AS n FROM v),
        |sp AS (SELECT p100, n, p100 * (n - 1) AS pos100
        |  FROM (VALUES (50), (90), (99)) AS t(p100), n),
        |sp2 AS (SELECT p100, n, pos100 // 100 + 1 AS lo, pos100 % 100 AS m FROM sp),
        |pick AS (SELECT sp2.p100, MAX(sp2.n) AS n, MAX(sp2.m) AS m,
        |    MAX(CASE WHEN r.r = sp2.lo THEN v END) AS vlo,
        |    MAX(CASE WHEN r.r = sp2.lo + 1 THEN v END) AS vhi
        |  FROM sp2 JOIN r ON r.r BETWEEN sp2.lo AND sp2.lo + 1 GROUP BY 1)
        |SELECT p100 / 100.0 AS pct, CAST(n AS BIGINT) AS n,
        |  round(vlo + (m * (COALESCE(vhi, vlo) - vlo)) / 100.0, 6) AS value
        |FROM pick ORDER BY pct""".stripMargin,
    "agg_percentile_grouped" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS v, l_orderkey, l_linenumber FROM lineitem),
        |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, l_orderkey, l_linenumber) AS r FROM v),
        |n AS (SELECT g, COUNT(*) AS n FROM v GROUP BY 1),
        |sp AS (SELECT g, p100, n, p100 * (n - 1) AS pos100
        |  FROM (VALUES (50), (90), (99)) t(p100), n),
        |sp2 AS (SELECT g, p100, n, pos100 // 100 + 1 AS lo, pos100 % 100 AS m FROM sp),
        |pick AS (SELECT sp2.g, sp2.p100, MAX(sp2.n) AS n, MAX(sp2.m) AS m,
        |    MAX(CASE WHEN r.r = sp2.lo THEN v END) AS vlo,
        |    MAX(CASE WHEN r.r = sp2.lo + 1 THEN v END) AS vhi
        |  FROM sp2 JOIN r ON r.g = sp2.g AND r.r BETWEEN sp2.lo AND sp2.lo + 1
        |  GROUP BY 1, 2)
        |SELECT g AS l_returnflag, p100 / 100.0 AS pct, CAST(n AS BIGINT) AS n,
        |  round(vlo + (m * (COALESCE(vhi, vlo) - vlo)) / 100.0, 6) AS value
        |FROM pick ORDER BY 1, 2""".stripMargin,
    "agg_percentile_weighted" ->
      """WITH v AS (SELECT l_extendedprice AS v, CAST(round(l_quantity) AS BIGINT) AS w,
        |    l_orderkey, l_linenumber FROM lineitem),
        |t AS (SELECT SUM(w) AS tw FROM v),
        |c AS (SELECT v, SUM(w) OVER (ORDER BY v, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM v),
        |sp AS (SELECT p100, p100 * tw AS t100, tw
        |  FROM (VALUES (50), (90), (99)) s(p100), t)
        |SELECT p100 / 100.0 AS pct, CAST(tw AS BIGINT) AS w_total,
        |  round(MIN(CASE WHEN cw * 100 >= t100 THEN v END), 6) AS value
        |FROM sp, c GROUP BY p100, tw ORDER BY pct""".stripMargin,
    "agg_skew_salted" ->
      s"""SELECT user_id, ${oSum("value")} AS sum_value, COUNT(*) AS n
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "join_skew_salted" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_events, ${oSum("value")} AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "set_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "set_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "agg_minmax_by" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_orderkey, l_discount,
        |    CAST(l_extendedprice AS DECIMAL(20,2)) * 1000000000 + l_orderkey AS uk
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  arg_max(l_orderkey, uk) AS top_order,
        |  arg_min(l_orderkey, uk) AS bottom_order,
        |  CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
        |  CAST(MAX(uk) AS BIGINT) AS max_uk
        |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS nd
        |  FROM h)
        |SELECT l_returnflag,
        |  round(CASE WHEN MAX(nd) < 64 THEN CAST(MAX(nd) AS DOUBLE)
        |    ELSE 63.0 * 1152921504606846976.0 / MAX(CASE WHEN rk = 64 THEN h END)
        |    END, 4) AS kmv_est,
        |  CAST(MAX(nd) AS BIGINT) AS exact_nd
        |FROM r WHERE rk <= 64
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
