package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is non-reproducible across runs/planners and
  * cannot be oracle-checked, so both operators key the sample on a
  * cryptographic hash of the row's natural key — the standard "hash mod
  * N" reservoir-free sampling used in large corpus pipelines. At 100 TB
  * this is embarrassingly parallel: a narrow per-row filter/window with
  * no repartitioning beyond the stratified operator's per-group window.
  *
  * Reference capability: the reference has no sampling operator (absence
  * noted in SURVEY.md §2.1); this is part of the pipeline extension set.
  */
object Sample {

  type Q = (SparkSession, String) => DataFrame

  /** ~10% Bernoulli sample of lineitem: keep rows whose md5(key) prefix
    * falls below a fixed hex threshold. '1a00'/'10000' = 9.96%.
    */
  private val hashBernoulli: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .filter(
        substring(md5(concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string"))), 1, 4) < "1a00")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Stratified fixed-size sample: 20 docs per language, chosen by hash
    * order (deterministic shuffle) within each stratum.
    */
  private val stratified: Q = (s, dir) => {
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 20)
      .orderBy("lang", "rn")
  }

  /** Weighted priority sample: top-200 lineitem rows by priority
    * w * u, where u is a 54-bit uniform hash of the row key and w =
    * l_quantity — rows are selected with probability increasing in their
    * weight, deterministically (the hash replaces rand()). The priority
    * stays in exact integer arithmetic (w <= 50 and u < 2^54 keep
    * w * u < 2^60, no overflow, no float rounding to drift across
    * engines) and is never emitted, so the output is just rows + rank.
    * At 100 TB this is a narrow per-row expression + TakeOrderedAndProject
    * (bounded per-partition heaps, no full sort): the limit(200) runs
    * BEFORE the rank window, so the only unpartitioned window in the plan
    * sees exactly 200 rows.
    */
  private val weighted: Q = (s, dir) => {
    val w = Window.orderBy(col("prio").desc, col("l_orderkey"), col("l_linenumber"))
    Tables(s, dir, "lineitem")
      .withColumn("u",
        expr("cast(conv(substr(md5(cast(l_orderkey as string) || '-' || cast(l_linenumber as string)), 1, 15), 16, 10) as bigint) div 64"))
      .withColumn("prio", floor(col("l_quantity")) * col("u"))
      .orderBy(col("prio").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(200)
      .withColumn("rk", row_number().over(w))
      .select("rk", "l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("rk")
  }

  val queries: Map[String, Q] = Map(
    "sample_hash_bernoulli" -> hashBernoulli,
    "sample_stratified" -> stratified,
    "sample_weighted" -> weighted,
  )

  val oracles: Map[String, String] = Map(
    "sample_hash_bernoulli" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE substr(md5(l_orderkey || '-' || l_linenumber), 1, 4) < '1a00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    "sample_weighted" ->
      """WITH p AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    CAST(floor(l_quantity) AS BIGINT)
        |      * (CAST(('0x' || substr(md5(l_orderkey || '-' || l_linenumber), 1, 15)) AS BIGINT) // 64)
        |      AS prio
        |  FROM lineitem)
        |SELECT row_number() OVER (ORDER BY prio DESC, l_orderkey, l_linenumber) AS rk,
        |  l_orderkey, l_linenumber, l_quantity
        |FROM p ORDER BY prio DESC, l_orderkey, l_linenumber LIMIT 200""".stripMargin,
  )
}
