package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-window operators over the `events` table, in their batch form so
  * DuckDB can oracle-check them. The same groupBy(window(...)) /
  * session_window plans run unchanged under Structured Streaming — the
  * streaming smoke test in StreamingSpec drives exactly these shapes
  * through readStream + watermark.
  */
object Windowed {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  private val tumbling: Q = (s, dir) => {
    val e = Tables(s, dir, "events")
    e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type")
  }

  /** Sliding 1h window every 15min: each event lands in exactly 4 windows. */
  private val sliding: Q = (s, dir) => {
    val e = Tables(s, dir, "events")
    e.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type")
  }

  /** Session windows with a 30-minute gap per user. Spark semantics:
    * a new session starts when ts >= previous ts + gap; session end =
    * last ts + gap. The oracle reproduces this with gaps-and-islands SQL.
    */
  private val session: Q = (s, dir) => {
    val e = Tables(s, dir, "events")
    e.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")
  }

  /** Stream-stream interval join in its batch form: each click joined to
    * the same user's purchases in the following hour. Under Structured
    * Streaming the identical join (watermarks both sides + this time
    * bound) runs with bounded state — the time constraint is what lets
    * the engine expire buffered rows; StreamJoinSpec drives that shape.
    * At 100 TB both sides shuffle once on user_id and the per-key state
    * is bounded by the 1 h window.
    */
  private val intervalJoin: Q = (s, dir) => {
    val e = Tables(s, dir, "events")
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    c.join(p, col("cu") === col("pu") &&
        col("pts") > col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .select(col("cu").as("user_id"), col("click_id"), col("purchase_id"),
        (unix_timestamp(col("pts")) - unix_timestamp(col("cts"))).as("lag_sec"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  /** Watermark-dedup in its batch form: one surviving row per
    * (user_id, event_type) — the earliest by (ts, event_id) — plus the
    * collapse count. The streaming twin is dropDuplicates over the same
    * key behind a watermark (StreamJoinSpec); batch determinism comes
    * from the total (ts, event_id) tie-break, which a replayed stream
    * honors only by arrival order — exactly why the batch form pins
    * VALUES and the streaming spec pins key-set semantics.
    */
  private val streamDedup: Q = (s, dir) => {
    val e = Tables(s, dir, "events")
    e.groupBy("user_id", "event_type")
      .agg(min(struct(col("ts"), col("event_id"))).as("f"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("event_type"),
        col("f.event_id").as("first_event_id"),
        date_format(col("f.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_ts"),
        col("n_events"))
      .orderBy("user_id", "event_type")
  }

  /** Time-series resample + gap-fill: per-user daily averages on a dense
    * day grid (each user's own [min_day, max_day] span, generated with
    * `sequence`), missing days linearly interpolated between the nearest
    * present neighbors (last/first ignoreNulls frames). The window is
    * PARTITIONED BY user — per-key state only, no global ordering — and
    * the grid explode emits ~span-days rows per user: the shape a 100 TB
    * metrics store resamples with. Exact decimal day-sums make the
    * averages engine-identical; interpolation is rounded to 6 places.
    */
  private val resampleInterpolate: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(s, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg((dsum(col("value")) / count(lit(1))).as("v"))
    val span = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(col("user_id"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val j = grid.join(daily, Seq("user_id", "day"), "left")
    val wPrev = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(0, Window.unboundedFollowing)
    j.withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pd",
        last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nd",
        first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wNext))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        round(when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")))), 6).as("v"),
        col("v").isNull.as("interpolated"))
      .orderBy("user_id", "day")
  }

  /** A REAL Structured Streaming execution inside the oracle gate (the
    * other stream_* queries run their shapes in batch form; the
    * streaming specs drive them via readStream separately). This one
    * builds a file-source stream over the lineitem parquet, aggregates
    * in complete mode into a memory sink under Trigger.AvailableNow —
    * which processes everything available then terminates, making a
    * streaming query deterministic and therefore DuckDB-checkable. At
    * 100 TB this is the incremental-ingest shape: the source tracks
    * processed files, each trigger handles only new arrivals, and the
    * same aggregation state carries across triggers.
    */
  private val fileSource: Q = (s, dir) => {
    val schema = Tables(s, dir, "lineitem").schema
    // file streams take a DIRECTORY (they track processed files under it);
    // the glob filter scopes this one to the lineitem table file(s)
    val agg = s.readStream.schema(schema)
      .option("pathGlobFilter", "lineitem.parquet*").parquet(dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    val name = "stream_file_src_" + java.lang.Integer.toHexString(dir.hashCode)
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name).orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "stream_file_source" -> fileSource,
    "stream_tumbling" -> tumbling,
    "stream_sliding" -> sliding,
    "stream_session" -> session,
    "stream_interval_join" -> intervalJoin,
    "stream_dedup" -> streamDedup,
    "ts_resample_interpolate" -> resampleInterpolate,
  )

  val oracles: Map[String, String] = Map(
    "stream_file_source" ->
      s"""SELECT l_returnflag, COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_tumbling" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS ws,
         | event_type, COUNT(*) AS n, ${oSum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "stream_sliding" ->
      s"""SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
         |   - k * INTERVAL '15 minutes', '%Y-%m-%d %H:%M') AS ws,
         | event_type, COUNT(*) AS n, ${oSum("value")} AS sum_value
         |FROM events, (SELECT unnest([0,1,2,3]) AS k) ks
         |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "stream_session" ->
      s"""WITH l AS (
         |  SELECT user_id, event_id, ts, value,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
         |  FROM events),
         |f AS (
         |  SELECT *, CASE WHEN pts IS NULL
         |    OR ts - pts >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
         |  FROM l),
         |g AS (
         |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM f)
         |SELECT user_id,
         | strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         | strftime(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
         | COUNT(*) AS n_events, ${oSum("value")} AS sum_value
         |FROM g GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,
    "stream_interval_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS cts
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS pts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id AS user_id, click_id, purchase_id,
        |  CAST(floor(epoch(pts)) AS BIGINT) - CAST(floor(epoch(cts)) AS BIGINT) AS lag_sec
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND pts > cts AND pts <= cts + INTERVAL '1 hour'
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    "stream_dedup" ->
      """WITH r AS (SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_events
        |  FROM events)
        |SELECT user_id, event_type, event_id AS first_event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        |  CAST(n_events AS BIGINT) AS n_events
        |FROM r WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin,
    "ts_resample_interpolate" ->
      s"""WITH daily AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day,
         |    ${oSum("value")} / COUNT(*) AS v
         |  FROM events GROUP BY 1, 2),
         |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
         |  FROM daily GROUP BY 1),
         |grid AS (SELECT user_id,
         |  CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM span),
         |j AS (SELECT g.user_id, g.day, d.v
         |  FROM grid g LEFT JOIN daily d USING (user_id, day)),
         |w AS (SELECT user_id, day, v,
         |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         |  LAST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         |  FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         |  FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
         |  FROM j)
         |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
         |  round(CASE WHEN v IS NOT NULL THEN v
         |    ELSE pv + (nv - pv) *
         |      (CAST(date_diff('day', pd, day) AS DOUBLE) / date_diff('day', pd, nd))
         |    END, 6) AS v,
         |  v IS NULL AS interpolated
         |FROM w ORDER BY user_id, day""".stripMargin,
  )
}
