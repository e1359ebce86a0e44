package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 additions: invariants the driver's hash-compare can't express,
  * plus loud guards for documented scale bounds.
  */
class RoundFiveOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("mm_decode_stub sums UTF-8 BYTES, not code points, on a non-ASCII corpus") {
    import s.implicits._
    // 14 code points but 18 UTF-8 bytes — a code-point implementation
    // (or oracle) would report n_bytes=14 and a different mean
    val text = "héllo wörld …."
    val bytes = text.getBytes("UTF-8").map(_ & 0xff)
    assert(bytes.length == 18 && text.length == 14)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mmspec").toString
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = operators.Multimodal.queries("mm_decode_stub")(s, tmp).collect().head
    assert(r.getAs[Long]("n_bytes") == bytes.length.toLong)
    assert(math.abs(r.getAs[Double]("mean_byte") - bytes.sum.toDouble / bytes.length) < 1e-12)
  }

  test("win_topk_agg oracle key packing requires o_orderkey < 2^24 — fail loudly at larger SF") {
    val maxKey = Tables(s, dir, "orders")
      .agg(max(col("o_orderkey"))).collect().head.getLong(0)
    assert(maxKey < (1L << 24),
      s"o_orderkey max $maxKey >= 2^24: the win_topk_agg oracle's " +
        "cents*2^24 + (2^24-1-orderkey) packing overflows — widen the field " +
        "(see Analytic.winTopkAgg scaladoc) before trusting that oracle")
  }

  test("text_span_scrub: counts are consistent and untouched docs fingerprint their original tokens") {
    val out = operators.Dedup.queries("text_span_scrub")(s, dir).collect()
    val docs = Tables(s, dir, "documents").count()
    assert(out.length == docs, "one output row per document")
    assert(out.forall(r => r.getAs[Long]("n_scrubbed") >= 0 &&
      r.getAs[Long]("n_scrubbed") <= r.getAs[Long]("n_tokens")))
    assert(out.exists(_.getAs[Long]("n_scrubbed") > 0),
      "corpus has duplicated spans; scrub must be non-vacuous")
    // untouched docs: cleaned text == whitespace-normalized original
    val expect = Tables(s, dir, "documents")
      .select(col("doc_id"), md5(expr(
        "concat_ws(' ', filter(split(text, ' '), t -> length(t) > 0))")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val untouched = out.filter(_.getAs[Long]("n_scrubbed") == 0)
    assert(untouched.nonEmpty)
    untouched.foreach { r =>
      assert(r.getAs[String]("clean_fp") == expect(r.getAs[Long]("doc_id")))
    }
  }

  test("text_span_scrub keeps every duplicated span's first occurrence: scrubbed tokens < total dup coverage") {
    // the corpus-wide first occurrence of each dup span is preserved, so
    // total scrubbed tokens must be strictly less than total tokens under
    // duplicated spans (which includes the kept first occurrences)
    val out = operators.Dedup.queries("text_span_scrub")(s, dir).collect()
    val scrubbed = out.map(_.getAs[Long]("n_scrubbed")).sum
    val spanRows = operators.Dedup.queries("dedup_span")(s, dir).collect()
    assert(spanRows.nonEmpty)
    // n_occ spans of 8 tokens each bound coverage from above
    val upper = spanRows.map(r => r.getAs[Long]("n_occ") * 8).sum
    assert(scrubbed > 0 && scrubbed < upper,
      s"scrubbed=$scrubbed not in (0, $upper)")
  }

  test("agg_approx_distinct accuracy claim holds: every group within 5% of exact") {
    val rows = operators.Relational.queries("agg_approx_distinct")(s, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_5pct")),
      "HLL estimate drifted past its documented 5% bound")
  }

  test("join_null_safe really exercises the NULL group (injected keys match across sides)") {
    val rows = operators.Relational.queries("join_null_safe")(s, dir).collect()
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length == 1, "exactly one NULL-day group must survive the <=> join")
    assert(nullRow.head.getLong(1) > 0 && nullRow.head.getLong(2) > 0)
  }
}
