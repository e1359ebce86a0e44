package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-9 batch — properties the DuckDB hash
  * gate cannot see. The headline item: the Gramian accumulator's two-limb
  * rewrite is driven PAST the old single-long wrap bound and checked
  * against an independent BigInt recomputation.
  */
class RoundNineOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("gramian_of: exact past the old 2^22-vector single-long bound (two-limb accumulator)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.GramianAgg.gramian_of
    // 9 M max-magnitude (2^20) components: Σq² = 9e6·2^40 ≈ 9.90e18 —
    // past Long.MaxValue (9.22e18), where the old accumulator wrapped
    // silently. Multi-partition range exercises update, serialize,
    // deserialize AND the 128-bit merge path.
    val n = 9000000L
    val df = s.range(n).repartition(8)
      .select(array(lit(1048576L), lit(-1048576L)).as("q"))
    val row = df.agg(gramian_of(col("q"), 2).as("g")).selectExpr(
      "g.n", "g.s[0]", "g.s[1]",
      "cast(g.p[0] as string)", "cast(g.p[1] as string)", "cast(g.p[2] as string)").head()
    val p = BigInt(n) * BigInt(1048576L) * BigInt(1048576L) // independent recomputation
    assert(p > BigInt(Long.MaxValue), "test must exceed the old wrap bound")
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == n * 1048576L)
    assert(row.getLong(2) == -n * 1048576L)
    assert(BigInt(row.getString(3)) == p)
    assert(BigInt(row.getString(4)) == -p)
    assert(BigInt(row.getString(5)) == p)
  }

  test("GramianBuffer: randomized adds + shuffled merges match BigInt recomputation") {
    import org.apache.spark.sql.graft.GramianBuffer
    val rnd = new scala.util.Random(9)
    val dim = 4
    val vecs = Array.fill(20000)(Array.fill(dim)(
      (rnd.nextLong() % 1048576L))) // |q| ≤ 2^20, signed
    val chunks = vecs.grouped(1000).map { ch =>
      val b = new GramianBuffer(dim)
      ch.foreach(b.add)
      b
    }.toArray
    val order = rnd.shuffle(chunks.indices.toList)
    val acc = new GramianBuffer(dim)
    order.foreach(i => acc.mergeFrom(chunks(i)))
    // independent BigInt recomputation of every triangle entry
    var idx = 0
    for (i <- 0 until dim; j <- i until dim) {
      val exp = vecs.foldLeft(BigInt(0))((a, v) => a + BigInt(v(i)) * BigInt(v(j)))
      assert(acc.prod(idx) == exp, s"prod($i,$j) drift")
      idx += 1
    }
    for (i <- 0 until dim)
      assert(acc.sums(i) == vecs.foldLeft(0L)((a, v) => a + v(i)))
    assert(acc.n == vecs.length)
  }

  test("pointer-doubling CC converges on a diameter-50 path where 8-round hash-min provably does not") {
    import org.apache.spark.sql.functions._
    import s.implicits._
    // path 0—1—…—50: the true component min is 0 for every node, but
    // hash-min moves information one hop per round, so after 8 rounds
    // node 50 carries label 42 — a non-component the budget-mirroring
    // oracle could never catch. Pointer doubling jumps labels through
    // the label table and closes the same path in ~log2(50) rounds.
    // persist mirrors the production adjacency cache shape
    val adj = (0 until 50)
      .flatMap(i => Seq((i.toLong, i.toLong + 1), (i.toLong + 1, i.toLong)))
      .toDF("src", "dst")
      .repartition(4, col("src"))
      .persist()
    adj.count()
    val hm = operators.Graph.hashMinLabels(adj, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hm(50L) == 42L && hm.values.exists(_ != 0L),
      s"hash-min unexpectedly converged inside 8 rounds: ${hm.toSeq.sorted}")
    val pd = operators.Graph.pointerDoubleLabels(adj, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pd.size == 51 && pd.values.forall(_ == 0L),
      s"pointer doubling failed to reach the true fixpoint: ${pd.toSeq.sorted}")
  }

  test("graph_cc_pointer_doubling equals graph_connected_components on the co-purchase graph") {
    val a = SparkEntry.queries("graph_cc_pointer_doubling")(s, dir)
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("graph_connected_components")(s, dir)
      .collect().map(_.toString).toSeq
    assert(a == b, "the two CC variants disagree — both must sit at the unique min-label fixpoint")
  }

  test("dedup_ngram_minhash: pairs are a subset of the exact set, recall >= 0.9") {
    val r = SparkEntry.queries("dedup_ngram_minhash_recall")(s, dir).head()
    assert(r.getAs[Double]("recall") >= 0.9,
      s"recall ${r.getAs[Double]("recall")} below the 0.9 floor " +
        s"(${r.getAs[Long]("n_found")}/${r.getAs[Long]("n_exact")})")
    // same measure + threshold as the exact plan ⇒ precision is exactly 1:
    // every approximate pair must appear in the exact pair set
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(s, dir).select("doc_a", "doc_b")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val exact = pairs("dedup_ngram_jaccard")
    val approx = pairs("dedup_ngram_minhash")
    assert(approx.subsetOf(exact),
      s"non-exact pairs leaked: ${(approx -- exact).take(5)}")
  }

  test("xxhash64 pair keys: zero ckey collisions in the corpus (documented assumption, now checked)") {
    import org.apache.spark.sql.functions._
    // the posting-join pair keys are xxhash64(md5(text)) longs; a
    // collision would silently merge two contents' posting groups with
    // no runtime detection path — probability ~|reps|²/2⁶⁵, but this
    // turns the assumption into a checked fact on every test corpus
    val r = Tables(s, dir, "documents")
      .select(md5(col("text")).as("ckey"))
      .agg(countDistinct(col("ckey")).as("nk"),
        countDistinct(expr("xxhash64(ckey)")).as("nh")).head()
    assert(r.getLong(0) == r.getLong(1),
      s"${r.getLong(0) - r.getLong(1)} xxhash64 collisions across distinct contents")
  }

  test("gramian_of: a vector of the wrong dimension throws (schema drift fail-fast)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.GramianAgg.gramian_of
    val bad = s.range(10).select(
      when(col("id") === 5, array(lit(1L), lit(2L), lit(3L)))
        .otherwise(array(lit(1L), lit(2L))).as("q"))
    val ex = intercept[Exception] {
      bad.agg(gramian_of(col("q"), 2)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("schema drift")), s"unexpected error: $ex")
  }
}
