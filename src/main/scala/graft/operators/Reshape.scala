package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

/** Shape/semantics operators: unpivot (wide→long melt), map/struct
  * construction + field access, SQL null semantics (nullif / coalesce /
  * null-safe equality), and bitwise/boolean aggregates.
  *
  * All four are narrow per-row transforms or single hash aggregations —
  * no operator here shuffles more than its (small) aggregate state, so
  * each scales linearly with input.
  */
object Reshape {

  type Q = (SparkSession, String) => DataFrame

  /** Wide→long melt of the four lineitem measures via Dataset.unpivot
    * (Spark plans an Expand — one pass, no shuffle).
    */
  private val unpivot: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "val")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // val participates in the sort so the ordering is total
      .orderBy("l_orderkey", "l_linenumber", "metric", "val")
  }

  /** JSON→map + struct build/field-access over events.props. */
  private val mapStruct: Q = (s, dir) => {
    Tables(s, dir, "events")
      .filter(col("event_id") % 20 === 0)
      .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
      .select(
        col("event_id"),
        size(map_keys(col("m"))).cast("int").as("n_keys"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
        col("m").getItem("k").as("k_val"),
        struct(col("event_type").as("et"), col("value").as("v"))
          .getField("et").as("et"))
      .orderBy("event_id")
  }

  /** Null semantics: nullif, coalesce chains, ifnull, null-safe equality
    * (Spark `<=>` ≡ ANSI IS NOT DISTINCT FROM).
    */
  private val nullSemantics: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") % 50 === 0)
      .withColumn("st_null", nullif(col("o_orderstatus"), lit("O")))
      .select(
        col("o_orderkey"),
        col("st_null"),
        coalesce(col("st_null"), lit("fallback")).as("st_coal"),
        expr("ifnull(st_null, '?')").as("st_ifnull"),
        (col("st_null") <=> lit("F")).as("is_f_nullsafe"),
        col("st_null").isNull.as("was_open"))
      .orderBy("o_orderkey")
  }

  /** Bitwise AND/OR/XOR and boolean aggregates per return flag. */
  private val bitwiseAgg: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("bit_and(l_partkey)").as("band"),
        expr("bit_or(l_partkey)").as("bor"),
        expr("bit_xor(l_partkey)").as("bxor"),
        expr("bool_and(l_quantity > 0)").as("all_pos"),
        expr("bool_or(l_discount > 0.09)").as("any_deep_disc"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "reshape_unpivot" -> unpivot,
    "fn_map_struct" -> mapStruct,
    "fn_null_semantics" -> nullSemantics,
    "agg_bitwise" -> bitwiseAgg,
  )

  val oracles: Map[String, String] = Map(
    "reshape_unpivot" ->
      """SELECT l_orderkey, l_linenumber, name AS metric, value AS val
        |FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
        |             l_extendedprice, l_discount, l_tax
        |           FROM lineitem WHERE l_orderkey % 100 = 0)
        |  ON l_quantity, l_extendedprice, l_discount, l_tax
        |  INTO NAME name VALUE value)
        |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin,
    "fn_map_struct" ->
      """SELECT event_id,
        |  CAST(len(json_keys(props)) AS INT) AS n_keys,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
        |  struct_pack(et := event_type, v := value).et AS et
        |FROM events WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin,
    "fn_null_semantics" ->
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS st_null,
        |  coalesce(nullif(o_orderstatus, 'O'), 'fallback') AS st_coal,
        |  ifnull(nullif(o_orderstatus, 'O'), '?') AS st_ifnull,
        |  nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS is_f_nullsafe,
        |  nullif(o_orderstatus, 'O') IS NULL AS was_open
        |FROM orders WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey""".stripMargin,
    "agg_bitwise" ->
      """SELECT l_returnflag,
        |  bit_and(l_partkey) AS band, bit_or(l_partkey) AS bor,
        |  bit_xor(l_partkey) AS bxor,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.09) AS any_deep_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
