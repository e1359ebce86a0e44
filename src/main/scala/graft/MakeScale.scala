package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: regenerate the full-suite scale-sweep corpora (the r9
  * precedent the per-round sweeps re-run) — N key-shifted copies of ONE
  * subject table, every other table copied through at sf0.1, so the
  * official bench protocol can be pointed at the dir unchanged.
  *
  * Usage: runMain graft.MakeScale <srcDir> <outDir> <n> <subject>
  *   subject ∈ {events, lineitem, graph}
  *
  *  - events:   event_id shifted by copy·(max+1); user_id and ts left in
  *    place so sessionization / per-user windows absorb N× the rows per
  *    key — the adversarial direction for the streaming family.
  *  - lineitem: l_orderkey AND l_partkey shifted (the sf16g "TRUE N×
  *    graph" shape: the co-purchase graph genuinely grows N×; orders is
  *    shifted to match so the orderkey join keeps its selectivity).
  *  - graph:    lineitem + orders + documents all N× (doc text gets a
  *    copy-suffix token so dedup scales in DISTINCT contents, not
  *    copies — the harder direction for LSH candidate generation).
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val (src, out, n, subject) = (args(0), args(1), args(2).toInt, args(3))
    // overwrite-mode writes of lazily-read inputs: out == src would
    // delete each table before its own self-read executes, destroying
    // the source corpus (the mergeAll self-overwrite guard, applied here)
    require(
      java.nio.file.Paths.get(out).toAbsolutePath.normalize() !=
        java.nio.file.Paths.get(src).toAbsolutePath.normalize(),
      s"outDir must differ from srcDir ($src): overwrite would consume its own input")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(n).select(col("id").as("cp")))

    def shift(df: DataFrame, key: String): org.apache.spark.sql.Column = {
      val mx = df.agg(max(col(key))).head().getLong(0) + 1L
      col(key) + col("cp") * mx
    }

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[makescale] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    def passthrough(names: Seq[String]): Unit = names.foreach { t =>
      write(t, spark.read.parquet(s"$src/$t.parquet"))
    }

    val all = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")

    subject match {
      case "events" =>
        val e = spark.read.parquet(s"$src/events.parquet")
        write("events", copies(e)
          .withColumn("event_id", shift(e, "event_id"))
          .drop("cp"))
        passthrough(all.filterNot(_ == "events"))
      case "lineitem" =>
        val li = spark.read.parquet(s"$src/lineitem.parquet")
        val or = spark.read.parquet(s"$src/orders.parquet")
        val okStride = or.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
        val pkStride = li.agg(max(col("l_partkey"))).head().getLong(0) + 1L
        write("lineitem", copies(li)
          .withColumn("l_orderkey", col("l_orderkey") + col("cp") * okStride)
          .withColumn("l_partkey", col("l_partkey") + col("cp") * pkStride)
          .drop("cp"))
        write("orders", copies(or)
          .withColumn("o_orderkey", col("o_orderkey") + col("cp") * okStride)
          .drop("cp"))
        passthrough(all.filterNot(Set("lineitem", "orders")))
      case "graph" =>
        val li = spark.read.parquet(s"$src/lineitem.parquet")
        val or = spark.read.parquet(s"$src/orders.parquet")
        val dc = spark.read.parquet(s"$src/documents.parquet")
        val okStride = or.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
        val pkStride = li.agg(max(col("l_partkey"))).head().getLong(0) + 1L
        val idStride = dc.agg(max(col("doc_id"))).head().getLong(0) + 1L
        write("lineitem", copies(li)
          .withColumn("l_orderkey", col("l_orderkey") + col("cp") * okStride)
          .withColumn("l_partkey", col("l_partkey") + col("cp") * pkStride)
          .drop("cp"))
        write("orders", copies(or)
          .withColumn("o_orderkey", col("o_orderkey") + col("cp") * okStride)
          .drop("cp"))
        write("documents", copies(dc)
          .withColumn("doc_id", col("doc_id") + col("cp") * idStride)
          .withColumn("text", concat(col("text"), lit(" zz"), col("cp")))
          .drop("cp"))
        passthrough(all.filterNot(Set("lineitem", "orders", "documents")))
      case other => sys.error(s"unknown subject '$other'")
    }
    spark.stop()
  }
}
