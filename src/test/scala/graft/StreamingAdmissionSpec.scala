package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The admission gate run through Structured Streaming (the r10
  * verdict's ask #5): tonight's documents ARRIVE as a stream of files,
  * each micro-batch is scored against the PERSISTED frozen index
  * (minhash bands + LM + gram vocabulary via foreachBatch), and the
  * union of the per-micro-batch scores must equal the batch
  * pipeline_admission legs on the same slice — the streaming and batch
  * surfaces are the same story, told by the same artifacts.
  *
  * What is asserted is exactly what is micro-batch-DECOMPOSABLE: the
  * history near-dup verdict (batch×history pairs — batch×batch pairs
  * can span micro-batches by construction), the per-doc perplexity (a
  * pure function of the frozen LM), and the per-doc novelty (a pure
  * function of the frozen vocabulary). The CCNet bucket is a
  * batch-global rank and is owned by the batch gate.
  */
class StreamingAdmissionSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("micro-batches scored against the persisted index equal the batch legs") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream-index").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-stream-in").toString
    // batch-side reference (in-session path, before any override)
    val refDup = SparkEntry.queries("dedup_incremental")(s, dir)
      .filter(col("match_src") === "history")
      .select("batch_doc", "match_doc", "jaccard")
      .collect().map(_.toString).sorted.toSeq
    val refPpl = SparkEntry.queries("text_lm_ppl_filter")(s, dir)
      .select("doc_id", "ppl").collect().map(_.toString).sorted.toSeq
    val refNov = SparkEntry.queries("text_ngram_novelty")(s, dir)
      .select("doc_id", "novelty").collect().map(_.toString).sorted.toSeq
    try {
      IndexStore.writeAll(s, dir, root)
      // tonight's slice arrives as TWO files → two micro-batches
      val batchDocs = Tables(s, dir, "documents").filter(expr(Incr.isBatchDoc))
      batchDocs.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.parquet(s"$inDir/part_a")
      batchDocs.filter(col("doc_id") % 2 === 1).coalesce(1)
        .write.parquet(s"$inDir/part_b")
      IndexStore.use(Some(root))
      val schema = s.read.parquet(s"$inDir/part_a").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/part_*")
      val gotDup = scala.collection.mutable.ArrayBuffer.empty[String]
      val gotPpl = scala.collection.mutable.ArrayBuffer.empty[String]
      val gotNov = scala.collection.mutable.ArrayBuffer.empty[String]
      var batches = 0
      val q = stream.writeStream
        .foreachBatch { (mb: DataFrame, _: Long) =>
          // a micro-batch becomes a batch-only corpus dir (the hermetic
          // read-back shape IndexLifecycleSpec proves): the legs then
          // score it against ONLY the persisted artifacts
          val scratch = java.nio.file.Files
            .createTempDirectory("graft-stream-mb").toString
          mb.write.parquet(s"$scratch/documents.parquet")
          batches += 1
          gotDup ++= SparkEntry.queries("dedup_incremental")(s, scratch)
            .filter(col("match_src") === "history")
            .select("batch_doc", "match_doc", "jaccard")
            .collect().map(_.toString)
          gotPpl ++= SparkEntry.queries("text_lm_ppl_filter")(s, scratch)
            .select("doc_id", "ppl").collect().map(_.toString)
          gotNov ++= SparkEntry.queries("text_ngram_novelty")(s, scratch)
            .select("doc_id", "novelty").collect().map(_.toString)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(batches == 2, s"expected 2 micro-batches, saw $batches")
      assert(gotDup.sorted.toSeq == refDup,
        "streamed history near-dup verdicts drifted from the batch leg")
      assert(gotPpl.sorted.toSeq == refPpl,
        "streamed perplexities drifted from the batch leg")
      assert(gotNov.sorted.toSeq == refNov,
        "streamed novelty scores drifted from the batch leg")
    } finally IndexStore.use(None)
  }

  test("vector micro-batches scored against the persisted scaled-IVF index equal the batch leg") {
    // round 12's headline connected to the streaming surface: tonight's
    // EMBEDDINGS arrive as a file stream; each micro-batch is placed and
    // scored by sim_ivf_incremental against the persisted frozen
    // ⌊√n_hist⌋-cell quantizer (cell assignment, top-3 history
    // neighbors, the measured ncells — all off the artifacts), and the
    // union of per-micro-batch results must equal the batch leg. Every
    // output row is a pure function of (its vector, frozen index), so
    // the query is micro-batch-decomposable by construction.
    val root = java.nio.file.Files.createTempDirectory("graft-stream-vidx").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-stream-vin").toString
    val ref = SparkEntry.queries("sim_ivf_incremental")(s, dir)
      .collect().map(_.toString).sorted.toSeq
    try {
      IndexStore.writeAll(s, dir, root)
      val batchVecs = Tables(s, dir, "embeddings").filter(expr(Incr.isBatchVec))
      batchVecs.filter(col("vec_id") % 2 === 0).coalesce(1)
        .write.parquet(s"$inDir/part_a")
      batchVecs.filter(col("vec_id") % 2 === 1).coalesce(1)
        .write.parquet(s"$inDir/part_b")
      IndexStore.use(Some(root))
      val schema = s.read.parquet(s"$inDir/part_a").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/part_*")
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      var batches = 0
      val q = stream.writeStream
        .foreachBatch { (mb: DataFrame, _: Long) =>
          val scratch = java.nio.file.Files
            .createTempDirectory("graft-stream-vmb").toString
          mb.write.parquet(s"$scratch/embeddings.parquet")
          batches += 1
          got ++= SparkEntry.queries("sim_ivf_incremental")(s, scratch)
            .collect().map(_.toString)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(batches == 2, s"expected 2 micro-batches, saw $batches")
      assert(got.sorted.toSeq == ref,
        "streamed ANN placements/neighbors drifted from the batch leg")
    } finally IndexStore.use(None)
  }
}
