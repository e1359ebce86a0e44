package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** User-defined function surface proofs (SURVEY.md §2.2) plus the as-of
  * join: one scalar UDF, one typed Aggregator UDAF, one generator
  * (UDTF-style explode of a UDF-built array), and a time-ordered as-of
  * join emulated with a union + last-value window.
  *
  * UDFs here are deliberately *proofs of the extension surface* — every
  * performance-critical path in the engine uses builtins or codegen
  * Expressions instead (see VecExpressions.scala). Each UDF's semantics
  * are chosen so a DuckDB SQL oracle can reproduce them exactly.
  */
object Udf {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------- scalar UDF

  /** Scalar Scala UDF: slugify a part name. Same regex semantics as the
    * oracle's regexp_replace(...,'g') + trim.
    */
  private val slug = udf { s: String =>
    if (s == null) null
    else s.toLowerCase.replaceAll("[^a-z0-9]+", "-").stripPrefix("-").stripSuffix("-")
  }

  private val udfScalar: Q = (s, dir) => {
    s.udf.register("graft_slug", slug) // registered surface, SQL-callable
    Tables(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), slug(col("p_name")).as("slug"))
      .orderBy("p_partkey")
  }

  // ------------------------------------------------------------ typed UDAF

  /** Typed Aggregator: geometric mean via sum-of-logs (partial-mergeable,
    * so Spark plans it as partial + final aggregation like any builtin).
    */
  /** MUST be public: Spark's generated projection code instantiates the
    * buffer class and calls its accessors from janino-compiled Java — a
    * `private` buffer compiles but silently falls back to interpreted
    * projections on every aggregation batch (found via ERROR CodeGenerator
    * in the r2 verify log).
    */
  case class GeoBuf(sumLog: Double, n: Long)

  object GeoMean extends Aggregator[Double, GeoBuf, Double] {
    def zero: GeoBuf = GeoBuf(0.0, 0L)
    def reduce(b: GeoBuf, x: Double): GeoBuf =
      if (x > 0) GeoBuf(b.sumLog + math.log(x), b.n + 1) else b
    def merge(a: GeoBuf, b: GeoBuf): GeoBuf = GeoBuf(a.sumLog + b.sumLog, a.n + b.n)
    def finish(b: GeoBuf): Double = if (b.n == 0) 0.0 else math.exp(b.sumLog / b.n)
    def bufferEncoder = Encoders.product[GeoBuf]
    def outputEncoder = Encoders.scalaDouble
  }

  private val udafGeomean: Q = (s, dir) => {
    val geomean = udaf(GeoMean)
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(geomean(col("l_quantity")), 6).as("geo_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  // --------------------------------------------------------- UDTF (explode)

  /** Generator proof: UDF returns array<string> of word bigrams, explode
    * turns each doc row into n-1 rows (flatMap shape).
    */
  private val bigrams = udf { text: String =>
    if (text == null) Array.empty[String]
    else {
      val w = text.split(" ").filter(_.nonEmpty)
      (0 until math.max(w.length - 1, 0)).map(i => w(i) + " " + w(i + 1)).toArray
    }
  }

  private val udtfBigrams: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(bigrams(col("text"))).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"))
      .filter(col("n") >= 10)
      .orderBy(col("n").desc, col("bigram"))
  }

  // -------------------------------------------------------------- asof join

  /** As-of join: for every event, the most recent order (by o_orderdate,
    * ties broken by highest o_orderkey) of the same customer at or before
    * the event time.
    *
    * Spark has no ASOF JOIN; the classic distributed emulation is a
    * union of both streams tagged by side, one window sort per key, and
    * last_value(ignoreNulls) carried forward — a single shuffle on the
    * key, no range self-join blowup. Scale note: the window partition is
    * per-customer, so skew is bounded by the busiest customer, and the
    * same plan runs at 100 TB (vs a per-row correlated subquery which
    * would not).
    */
  private val joinAsof: Q = (s, dir) => {
    val ev = Tables(s, dir, "events").select(
      col("user_id").as("k"), col("ts").as("t"), lit(1).as("side"),
      col("event_id"), col("value"),
      lit(null).cast("long").as("o_orderkey"), lit(null).cast("double").as("o_totalprice"))
    val or = Tables(s, dir, "orders").select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"), lit(0).as("side"),
      lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
      col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("side"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionAll(or)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        date_format(col("t"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("asof_orderkey"), col("asof_totalprice"))
      .orderBy("event_id")
  }

  /** FORWARD as-of: each event pairs with the user's NEXT order
    * (earliest o_orderdate >= ts; ties by smallest orderkey) — the
    * "time-to-next-action" direction backward as-of can't express.
    * Same union+window emulation and single key shuffle as [[joinAsof]],
    * mirrored: events sort BEFORE orders at equal t (side DESC) so an
    * equal-timestamp order is inside the (currentRow → following) frame,
    * and first_value(ignoreNulls) picks the earliest upcoming order.
    */
  private val joinAsofFwd: Q = (s, dir) => {
    val ev = Tables(s, dir, "events").select(
      col("user_id").as("k"), col("ts").as("t"), lit(1).as("side"),
      col("event_id"),
      lit(null).cast("long").as("o_orderkey"), lit(null).cast("double").as("o_totalprice"))
    val or = Tables(s, dir, "orders").select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"), lit(0).as("side"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("side").desc, col("o_orderkey"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev.unionAll(or)
      .withColumn("next_orderkey", first(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("next_totalprice", first(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        date_format(col("t"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("next_orderkey"), col("next_totalprice"))
      .orderBy("event_id")
  }

  /** Same as-of semantics through the native custom operator
    * (AsOfJoinNode → AsOfJoinStrategy → AsOfJoinExec streaming merge,
    * plans/AsOfJoin.scala) instead of the union+window emulation. Both
    * share one oracle; `AsOfJoinSpec` additionally pins plan shape and
    * result equality between the two.
    */
  private val joinAsofNative: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val or = Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
    org.apache.spark.sql.graft.AsOfJoin(
        ev, or, "user_id", "ts", "o_custkey", "o_orderdate", "o_orderkey",
        Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("o_orderkey").as("asof_orderkey"),
        col("o_totalprice").as("asof_totalprice"))
      .orderBy("event_id")
  }

  /** NEAREST as-of (either direction, bounded tolerance) — the third
    * member of the as-of family: each `error` event pairs with the SAME
    * user's nearest `purchase` within 6 hours, whichever side of it.
    * Composed from both directional emulations over ONE union: the two
    * windows share the user_id partitioning (one key exchange + a
    * re-sort), then exact integer µs deltas (`unix_micros`) pick the
    * closer candidate — ties prefer the backward one, matching ASOF
    * conventions. Tie-breaks inside a direction follow the directional
    * queries (backward: latest, largest event_id; forward: earliest,
    * smallest). At 100 TB this is still a single-shuffle shape; the
    * tolerance bounds how stale a pairing can be, turning the
    * unmatchable rows into explicit NULLs instead of 26-year-old joins.
    */
  private val joinAsofNearest: Q = (s, dir) => {
    val e = Tables(s, dir, "events")
    val errs = e.filter(col("event_type") === "error").select(
      col("user_id").as("k"), col("ts").as("t"), lit(1).as("side"),
      col("event_id"), lit(null).cast("long").as("p_id"),
      lit(null).cast("double").as("p_value"))
    val purch = e.filter(col("event_type") === "purchase").select(
      col("user_id").as("k"), col("ts").as("t"), lit(0).as("side"),
      lit(null).cast("long").as("event_id"),
      col("event_id").as("p_id"), col("value").as("p_value"))
    val wb = Window.partitionBy("k").orderBy(col("t"), col("side"), col("p_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("k").orderBy(col("t"), col("side").desc, col("p_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tol = 21600000000L // 6 h in µs
    errs.unionAll(purch)
      .withColumn("prev_id", last(col("p_id"), ignoreNulls = true).over(wb))
      .withColumn("prev_val", last(col("p_value"), ignoreNulls = true).over(wb))
      .withColumn("prev_t", last(when(col("side") === 0, col("t")), ignoreNulls = true).over(wb))
      .withColumn("next_id", first(col("p_id"), ignoreNulls = true).over(wf))
      .withColumn("next_val", first(col("p_value"), ignoreNulls = true).over(wf))
      .withColumn("next_t", first(when(col("side") === 0, col("t")), ignoreNulls = true).over(wf))
      .filter(col("side") === 1)
      .withColumn("dprev", expr("unix_micros(t) - unix_micros(prev_t)"))
      .withColumn("dnext", expr("unix_micros(next_t) - unix_micros(t)"))
      .withColumn("use_prev",
        col("dprev").isNotNull && col("dprev") <= tol &&
          (col("dnext").isNull || col("dnext") > tol || col("dprev") <= col("dnext")))
      .withColumn("use_next",
        !col("use_prev") && col("dnext").isNotNull && col("dnext") <= tol)
      .select(col("event_id"), col("k").as("user_id"),
        when(col("use_prev"), col("prev_id")).when(col("use_next"), col("next_id"))
          .as("near_purchase_id"),
        when(col("use_prev"), col("prev_val")).when(col("use_next"), col("next_val"))
          .as("near_value"),
        when(col("use_prev"), col("dprev")).when(col("use_next"), col("dnext"))
          .as("dt_us"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "join_asof_nearest" -> joinAsofNearest,
    "fn_udf_scalar" -> udfScalar,
    "agg_udaf_geomean" -> udafGeomean,
    "fn_udtf_bigrams" -> udtfBigrams,
    "join_asof" -> joinAsof,
    "join_asof_fwd" -> joinAsofFwd,
    "join_asof_native" -> joinAsofNative,
  )

  val oracles: Map[String, String] = Map(
    // declarative nearest-within-tolerance; tie order mirrors the window
    // emulation (closer first, then backward, then the directional id rule)
    "join_asof_nearest" ->
      """SELECT e.event_id, e.user_id, o.p_id AS near_purchase_id,
        |  o.p_value AS near_value, o.adt AS dt_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |LEFT JOIN LATERAL (
        |  SELECT p.event_id AS p_id, p.value AS p_value,
        |    abs(epoch_us(p.ts) - epoch_us(e.ts)) AS adt
        |  FROM events p
        |  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
        |    AND abs(epoch_us(p.ts) - epoch_us(e.ts)) <= 21600000000
        |  ORDER BY adt ASC, CASE WHEN p.ts <= e.ts THEN 0 ELSE 1 END ASC,
        |    CASE WHEN p.ts <= e.ts THEN -p.event_id ELSE p.event_id END ASC
        |  LIMIT 1) o ON true
        |ORDER BY e.event_id""".stripMargin,
    "fn_udf_scalar" ->
      """SELECT p_partkey, p_name,
        | trim(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'), '-') AS slug
        |FROM part ORDER BY p_partkey""".stripMargin,
    "agg_udaf_geomean" ->
      """SELECT l_returnflag,
        | round(exp(sum(ln(l_quantity)) FILTER (WHERE l_quantity > 0)
        |   / count(*) FILTER (WHERE l_quantity > 0)), 6) AS geo_qty,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "fn_udtf_bigrams" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS w
        |  FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(w), 1)),
        |  i -> w[i] || ' ' || w[i+1])) AS bigram FROM tk)
        |SELECT bigram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS nd
        |FROM bg GROUP BY bigram HAVING COUNT(*) >= 10
        |ORDER BY n DESC, bigram""".stripMargin,
    "join_asof_native" ->
      """SELECT e.event_id, e.user_id,
        | strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        | o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON true
        |ORDER BY e.event_id""".stripMargin,
    "join_asof" ->
      """SELECT e.event_id, e.user_id,
        | strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        | o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON true
        |ORDER BY e.event_id""".stripMargin,
    "join_asof_fwd" ->
      """SELECT e.event_id, e.user_id,
        | strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        | o.o_orderkey AS next_orderkey, o.o_totalprice AS next_totalprice
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = e.user_id AND o_orderdate >= e.ts
        |  ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1) o ON true
        |ORDER BY e.event_id""".stripMargin,
  )
}
