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

  test("graph micro-batches fold into the persisted substrate: CC labels and closed triangles equal the batch legs") {
    // round 15 (r14 verdict ask #7): tonight's EDGES arrive as a
    // stream — lineitem rows split by order into two files → two
    // micro-batches — and each micro-batch folds into the persisted
    // graph substrate through the SAME primitives the batch legs use:
    //  - the bipartite CC labels fold cumulatively (ccFoldLabels is
    //    confluent: fold(fold(H, B1), B2) must equal fold(H, B1 ∪ B2),
    //    the split-invariance of the min-id fixpoint), and
    //  - each micro-batch's co-purchase edges probe the graph-so-far
    //    for closed triangles (a triangle spanning two micro-batches is
    //    found when its LATER edge arrives), so the deduped union must
    //    equal the one-shot batch probe.
    val root = java.nio.file.Files.createTempDirectory("graft-stream-gidx").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-stream-gin").toString
    // batch-side references (in-session path, before any override)
    val refCc = SparkEntry.queries("graph_cc_incremental")(s, dir)
      .collect().map(_.toString).sorted.toSeq
    val fullE = operators.Graph.fullSubstrate(s, dir)("graph_hist_edges")
      .localCheckpoint(true)
    val allBatchE = operators.Graph.buildBatchEdges(s, dir).localCheckpoint(true)
    def degOf(e: DataFrame): DataFrame =
      e.select(col("u").as("src")).unionAll(e.select(col("v").as("src")))
        .groupBy("src").agg(count(lit(1)).as("d"))
    val refTri = operators.Graph.batchClosedTriangles(
        allBatchE, operators.Graph.batchAdjOf(fullE, allBatchE), degOf(fullE))
      .collect().map(_.toString).toSet
    try {
      IndexStore.writeAll(s, dir, root)
      val li = Tables(s, dir, "lineitem")
      li.filter(col("l_orderkey") % 2 === 0).coalesce(1)
        .write.parquet(s"$inDir/part_a")
      li.filter(col("l_orderkey") % 2 === 1).coalesce(1)
        .write.parquet(s"$inDir/part_b")
      IndexStore.use(Some(root))
      val histE = s.read.parquet(s"$root/graph_hist_edges").localCheckpoint(true)
      var lbl = s.read.parquet(s"$root/graph_hist_cc_labels").localCheckpoint(true)
      var cumE = histE
      val gotTri = scala.collection.mutable.Set.empty[String]
      var batches = 0
      val schema = s.read.parquet(s"$inDir/part_a").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/part_*")
      val q = stream.writeStream
        .foreachBatch { (mb: DataFrame, _: Long) =>
          val scratch = java.nio.file.Files
            .createTempDirectory("graft-stream-gmb").toString
          mb.write.parquet(s"$scratch/lineitem.parquet")
          batches += 1
          // cumulative CC fold: this micro-batch's bipartite edges fold
          // into the labels as of the previous micro-batch
          lbl = operators.Graph.ccFoldLabels(s, scratch, lbl).localCheckpoint(true)
          // triangle probe: this micro-batch's co-purchase batch edges
          // against the graph accumulated so far (history ∪ prior mbs)
          val mbE = operators.Graph.buildBatchEdges(s, scratch).localCheckpoint(true)
          val grown = cumE.unionAll(
            mbE.join(cumE, Seq("u", "v"), "left_anti")).localCheckpoint(true)
          gotTri ++= operators.Graph.batchClosedTriangles(
              mbE, operators.Graph.batchAdjOf(grown, mbE), degOf(grown))
            .collect().map(_.toString)
          cumE = grown
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(batches == 2, s"expected 2 micro-batches, saw $batches")
      val gotCc = {
        val sizes = lbl.groupBy("lbl").agg(count(lit(1)).as("n_nodes"))
        lbl.join(sizes, "lbl")
          .select(col("node"), col("lbl").as("component"), col("n_nodes"))
          .collect().map(_.toString).sorted.toSeq
      }
      assert(gotCc == refCc,
        "cumulative micro-batch CC fold drifted from the one-shot batch fold")
      assert(gotTri == refTri,
        s"streamed triangle probe drifted from the batch probe: missing=${
          (refTri -- gotTri).take(3)} extra=${(gotTri -- refTri).take(3)}")
    } finally IndexStore.use(None)
  }
}
