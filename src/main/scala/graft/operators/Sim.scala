package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search pack over the `embeddings` table (64-dim unit-norm
  * float vectors).
  *
  * Two paths, mirroring a production ANN stack:
  *  - `sim_cosine_topk`: brute-force exact top-k for a small query set —
  *    the query side broadcasts, the corpus streams once; this is the
  *    correctness baseline and stays O(|Q| * N) with no shuffle of the
  *    corpus.
  *  - `sim_cosine_topk_lsh`: sign-random-projection LSH (8 deterministic
  *    hyperplanes -> 256 buckets); queries only score their own bucket.
  *    At 100 TB the bucket id becomes the partition key, so each query
  *    touches ~1/256 of the corpus. Recall vs the brute path is asserted
  *    in SimSpec (no DuckDB oracle — candidate sets are engine-specific,
  *    so the driver records a rows-only check).
  *
  * All dot products are double math; output similarity is round(.,6).
  */
object Sim {

  type Q = (SparkSession, String) => DataFrame

  private def vectors(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), expr("cast(embedding AS array<double>)").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0d, (a, x) -> a + x * x))"))

  private val K = 5

  /** Exact cosine top-k (k=5) for query vectors vec_id < 8 against the
    * whole corpus (self excluded). TakeOrderedAndProject shape per query.
    */
  private val bruteTopk: Q = (s, dir) => {
    val e = vectors(s, dir)
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .filter(col("q_id") < 8)
    val scored = broadcast(q).crossJoin(e)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_sim", expr(
        "round(aggregate(zip_with(qv, v, (x, y) -> x * y), 0d, (acc, z) -> acc + z) / (qn * nrm), 6)"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
      .select(col("q_id"), col("rk"), col("vec_id").as("cand_id"), col("cos_sim"))
      .orderBy("q_id", "rk")
  }

  /** Bucket id from 4 deterministic sign-random-projection hyperplanes
    * (16 buckets — sized so a bucket still holds real candidates at the
    * small test sf; at production scale raise to 8-12 planes);
    * hyperplane components are +-1 derived from xxhash64(j, i) — shared
    * nothing, computable on any executor, identical across runs.
    */
  private val bucketExpr = """
    aggregate(sequence(0, 3), 0, (acc, j) ->
      acc * 2 + (CASE WHEN aggregate(sequence(0, 63), 0d,
        (a2, i) -> a2 + element_at(v, i + 1) *
          (CASE WHEN pmod(xxhash64(j, i), 2) = 0 THEN cast(1.0 AS double) ELSE cast(-1.0 AS double) END)) > 0d
      THEN 1 ELSE 0 END))"""

  /** LSH-bucketed approximate top-k: same queries/k as the brute path but
    * candidates restricted to the query's own bucket (single probe).
    */
  private val lshTopk: Q = (s, dir) => {
    val e = vectors(s, dir).withColumn("bucket", expr(bucketExpr))
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qb"))
      .filter(col("q_id") < 8)
    val scored = broadcast(q).join(e, col("qb") === col("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_sim", expr(
        "round(aggregate(zip_with(qv, v, (x, y) -> x * y), 0d, (acc, z) -> acc + z) / (qn * nrm), 6)"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
      .select(col("q_id"), col("rk"), col("vec_id").as("cand_id"), col("cos_sim"))
      .orderBy("q_id", "rk")
  }

  val queries: Map[String, Q] = Map(
    "sim_cosine_topk" -> bruteTopk,
    "sim_cosine_topk_lsh" -> lshTopk,
  )

  val oracles: Map[String, String] = Map(
    "sim_cosine_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM v WHERE vec_id < 8),
        |s AS (SELECT q.q_id, v.vec_id AS cand_id,
        |  round(list_sum(list_transform(range(64), i -> q.qv[i+1] * v.v[i+1])) / (q.qn * v.nrm), 6) AS cos_sim
        |  FROM q JOIN v ON q.q_id <> v.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS rk FROM s)
        |SELECT q_id, rk, cand_id, cos_sim FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // sim_cosine_topk_lsh: intentionally no oracle — approximate candidate
    // set; recall vs brute force is asserted in SimSpec instead.
  )
}
