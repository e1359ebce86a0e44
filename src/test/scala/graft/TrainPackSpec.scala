package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data-prep pack: invariants the DuckDB oracle can't see —
  * packing conservation, chunk coverage/overlap, split proportions,
  * entropy bounds, quantizer range, canonicalization idempotence.
  */
class TrainPackSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("pack_sequences conserves docs and tokens and fills windows in order") {
    val toks = "filter(split(text, ' '), t -> length(t) > 0)"
    val docs = Tables(s, dir, "documents")
    val nDocs = docs.count()
    val nTok = docs.select(expr(s"cast(size($toks) as bigint)").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val out = operators.Train.queries("pack_sequences")(s, dir)
    val agg = out.agg(sum("n_docs"), sum("n_tokens")).collect()(0)
    assert(agg.getLong(0) == nDocs, "every doc must land in exactly one window")
    assert(agg.getLong(1) == nTok, "token mass must be conserved")
    // within a language, window ids are contiguous from 0
    val perLang = out.groupBy("lang")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"), count(lit(1)).as("n"))
      .collect()
    perLang.foreach { r =>
      val (lo, hi, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo == 0 && hi - lo + 1 == n,
        s"gap in window ids for ${r.getString(0)}: lo=$lo hi=$hi n=$n")
    }
  }

  test("chunk_sliding covers every token and respects the 64/48 geometry") {
    val out = operators.Train.queries("chunk_sliding")(s, dir).collect()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.head.getInt(1) == 1, "first chunk starts at token 1")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getInt(1) - a.getInt(1) == 48, "stride must be 48")
        case _ => ()
      }
      // doc length reconstructed from the last chunk; every chunk must
      // then have length min(64, n - st + 1), and the last must reach n
      val n = sorted.last.getInt(1) + sorted.last.getLong(2) - 1
      sorted.foreach { r =>
        assert(r.getLong(2) == math.min(64L, n - r.getInt(1) + 1),
          s"chunk at ${r.getInt(1)} has wrong length for doc of $n tokens")
      }
      assert(sorted.last.getInt(1) <= n, "last chunk must start inside the doc")
    }
  }

  test("sample_split_stratified puts ~90% of each language in train, deterministically") {
    val out = operators.Train.queries("sample_split_stratified")(s, dir)
    val m = out.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = m.keys.map(_._1).toSeq.distinct
    langs.foreach { l =>
      val tr = m.getOrElse((l, "train"), 0L)
      val va = m.getOrElse((l, "val"), 0L)
      assert(tr == math.ceil((tr + va) * 0.9).toLong, s"$l train size off")
    }
    val again = operators.Train.queries("sample_split_stratified")(s, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == again, "hash split must be reproducible")
  }

  test("text_entropy is within [0, ln(n_uniq)]") {
    operators.Train.queries("text_entropy")(s, dir).collect().foreach { r =>
      val nUniq = r.getLong(2).toDouble
      val ent = r.getDouble(3)
      assert(ent >= 0.0 && ent <= math.log(nUniq) + 1e-9,
        s"doc ${r.getLong(0)}: entropy $ent outside [0, ln($nUniq)]")
    }
  }

  test("dedup_url canonicalization is idempotent and collapses variants") {
    val out = operators.Train.queries("dedup_url")(s, dir)
    val canons = out.select("canon").collect().map(_.getString(0))
    canons.foreach { c =>
      assert(!c.contains("?") && !c.contains("#") && !c.endsWith("/") &&
        !c.contains("://www.") && c == c.toLowerCase, s"non-canonical: $c")
    }
    // variants must actually collapse: fewer canonical urls than docs
    assert(out.count() < Tables(s, dir, "documents").count())
    assert(out.agg(sum("n_urls")).collect()(0).getLong(0) ==
      Tables(s, dir, "documents").count())
  }

  test("text_length_clip deciles partition all docs with monotone bounds") {
    val rows = operators.Train.queries("text_length_clip")(s, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    assert(rows.map(_.getLong(1)).sum == Tables(s, dir, "documents").count())
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2),
        "decile bounds must be non-decreasing")
      case _ => ()
    }
    assert(rows.head.getString(4) == "low" && rows.last.getString(4) == "high")
  }

  test("emb_quantize stays in int8 range with small reconstruction error") {
    val out = operators.Train.queries("emb_quantize")(s, dir).collect()
    out.foreach { r =>
      val qs = r.getString(3).split(',').map(_.toInt)
      assert(qs.forall(q => q >= -127 && q <= 127), s"vec ${r.getLong(0)}: $qs")
      val dims = r.getLong(1)
      // max per-element error is scale/2 = maxabs/254
      val maxErr = dims * r.getDouble(2) / 254.0 + 1e-6
      assert(r.getDouble(4) <= maxErr,
        s"vec ${r.getLong(0)}: l1 ${r.getDouble(4)} > bound $maxErr")
    }
  }
}
