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

  val queries: Map[String, Q] = Map(
    "sample_hash_bernoulli" -> hashBernoulli,
    "sample_stratified" -> stratified,
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
  )
}
