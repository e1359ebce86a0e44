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

  val queries: Map[String, Q] = Map(
    "stream_tumbling" -> tumbling,
    "stream_sliding" -> sliding,
    "stream_session" -> session,
  )

  val oracles: Map[String, String] = Map(
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
  )
}
