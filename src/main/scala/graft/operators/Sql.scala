package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Modern SQL-surface pack (Spark 4 features): VARIANT semi-structured
  * access, LATERAL correlated subqueries, and recursive CTEs — the SQL
  * entry points a user of the engine gets beyond the DataFrame API.
  * All run through `spark.sql` over temp views of the shared tables.
  */
object Sql {

  type Q = (SparkSession, String) => DataFrame

  private def view(s: SparkSession, dir: String, t: String): String = {
    val name = s"g_$t"
    Tables(s, dir, t).createOrReplaceTempView(name)
    name
  }

  /** VARIANT (Spark 4 native semi-structured type): parse once, extract
    * typed fields — the open-schema path for event payloads. At scale
    * VARIANT beats string re-parsing per access (binary encoding, shredded
    * access), which is exactly what an events pipeline wants.
    */
  private val variant: Q = (s, dir) => {
    val ev = view(s, dir, "events")
    s.sql(
      s"""SELECT event_id,
         |  variant_get(pv, '$$.k', 'bigint') AS k_val,
         |  variant_get(pv, '$$.k', 'bigint') * 2 AS k_doubled,
         |  variant_get(pv, '$$.missing', 'bigint') AS absent
         |FROM (SELECT event_id, try_parse_json(props) AS pv
         |      FROM $ev WHERE event_id % 20 = 0)
         |ORDER BY event_id""".stripMargin)
  }

  /** LATERAL correlated subquery: each customer's single most expensive
    * order — the per-row top-1 idiom SQL users reach for. (Catalyst
    * decorrelates this into a join, so it stays distributed.)
    */
  private val lateralTopk: Q = (s, dir) => {
    val c = view(s, dir, "customer"); val o = view(s, dir, "orders")
    s.sql(
      s"""SELECT c_custkey, t.o_orderkey, t.o_totalprice
         |FROM $c, LATERAL (
         |  SELECT o_orderkey, o_totalprice FROM $o
         |  WHERE o_custkey = c_custkey
         |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
         |ORDER BY c_custkey""".stripMargin)
  }

  /** Recursive CTE (Spark 4): a generated key spine joined back to real
    * tables with a correlated count per step.
    */
  private val recursiveCte: Q = (s, dir) => {
    val n = view(s, dir, "nation"); val c = view(s, dir, "customer")
    s.sql(
      s"""WITH RECURSIVE r(k) AS (
         |  SELECT 0 UNION ALL SELECT k + 1 FROM r WHERE k < 24)
         |SELECT k, n_name,
         |  (SELECT COUNT(*) FROM $c WHERE c_nationkey = k) AS n_cust
         |FROM r JOIN $n ON n_nationkey = k
         |ORDER BY k""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "fn_variant" -> variant,
    "sql_lateral_topk" -> lateralTopk,
    "sql_recursive_cte" -> recursiveCte,
  )

  val oracles: Map[String, String] = Map(
    "fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled,
        |  CAST(json_extract(props, '$.missing') AS BIGINT) AS absent
        |FROM events WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin,
    "sql_lateral_topk" ->
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |ORDER BY c_custkey""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE r(k) AS (
        |  SELECT 0 UNION ALL SELECT k + 1 FROM r WHERE k < 24)
        |SELECT k, n_name,
        |  (SELECT COUNT(*) FROM customer WHERE c_nationkey = k) AS n_cust
        |FROM r JOIN nation ON n_nationkey = k
        |ORDER BY k""".stripMargin,
  )
}
