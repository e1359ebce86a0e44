package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query packs live under graft.operators / graft.text / graft.sim;
  * this object only assembles them.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.aggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Ingest.queries ++
      operators.Fn.queries ++
      operators.Analytic.queries ++
      operators.Windowed.queries ++
      operators.Text.queries ++
      operators.Dedup.queries ++
      operators.Sim.queries ++
      operators.Udf.queries ++
      operators.Multimodal.queries ++
      operators.Sample.queries ++
      operators.Reshape.queries ++
      operators.Flow.queries ++
      operators.Bucketed.queries ++
      operators.Sql.queries ++
      operators.Train.queries ++
      operators.Graph.queries ++
      operators.Layout.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.Ingest.oracles ++
      operators.Fn.oracles ++
      operators.Analytic.oracles ++
      operators.Windowed.oracles ++
      operators.Text.oracles ++
      operators.Dedup.oracles ++
      operators.Sim.oracles ++
      operators.Udf.oracles ++
      operators.Multimodal.oracles ++
      operators.Sample.oracles ++
      operators.Reshape.oracles ++
      operators.Flow.oracles ++
      operators.Bucketed.oracles ++
      operators.Sql.oracles ++
      operators.Train.oracles ++
      operators.Graph.oracles ++
      operators.Layout.oracles
}
