package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{MinHashSig, SimHash64, VecDot, VecFunctions}
import org.scalatest.funsuite.AnyFunSuite

/** Unit + property-style tests for the codegen expressions: the
  * interpreted eval path is exercised directly (no session) over seeded
  * random inputs, and interpreted-vs-codegen equality is checked through
  * DataFrame evaluation.
  */
class VecExpressionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def litD(a: Array[Double]) = Literal.create(a, ArrayType(DoubleType))
  private def litL(a: Array[Long]) = Literal.create(a, ArrayType(LongType))

  private def dot(a: Array[Double], b: Array[Double]): Double =
    VecDot(litD(a), litD(b)).eval(null).asInstanceOf[Double]

  test("vec_dot matches manual dot product") {
    assert(dot(Array(1, 2, 3), Array(4, 5, 6)) == 32.0)
    assert(dot(Array(), Array()) == 0.0)
    assert(dot(Array(1, 2), Array(3)) == 3.0) // min-length semantics
  }

  test("property: cosine of nonzero vectors is within [-1, 1]") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val a = Array.fill(16)(rnd.nextDouble() * 20 - 10)
      val b = Array.fill(16)(rnd.nextDouble() * 20 - 10)
      val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
      val c = dot(a, b) / (na * nb)
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
  }

  private def simhashRef(hs: Array[Long]): Long = {
    var r = 0L
    for (b <- 0 until 60) {
      val ones = hs.count(h => ((h >>> b) & 1L) == 1L)
      if (ones * 2 > hs.length) r |= (1L << b)
    }
    r
  }

  test("property: simhash64 eval matches an independent reference") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 3, 10, 64)) {
      val hs = Array.fill(n)(rnd.nextLong())
      val got = SimHash64(litL(hs)).eval(null).asInstanceOf[Long]
      assert(got == simhashRef(hs), s"n=$n")
    }
  }

  test("property: minhash_sig is order-invariant and monotone under union") {
    val rnd = new scala.util.Random(13)
    def sig(xs: Array[Long]): Seq[Long] =
      MinHashSig(litL(xs), 8).eval(null)
        .asInstanceOf[GenericArrayData].toLongArray().toSeq
    for (_ <- 1 to 50) {
      val a = Array.fill(1 + rnd.nextInt(40))(rnd.nextLong())
      val b = Array.fill(1 + rnd.nextInt(40))(rnd.nextLong())
      assert(sig(a) == sig(rnd.shuffle(a.toList).toArray))    // order-free
      val u = sig(a ++ b)
      assert(u.zip(sig(a)).forall { case (x, y) => x <= y })  // min shrinks
      assert(sig(a) == sig(a))                                // deterministic
    }
  }

  test("SQL registration: vec_dot/simhash64/minhash_sig callable from spark.sql") {
    VecFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1d, 2d), array(3d, 4d)) AS d, " +
        "simhash64(array(7L)) AS s, size(minhash_sig(array(7L, 9L), 4)) AS k")
      .collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 7L) // single hash: its bits are the majority
    assert(r.getInt(2) == 4)
  }

  test("bpe_count codegen expression == the declarative aggregate() fold, incl. non-ASCII and astral chars") {
    import org.apache.spark.sql.functions._
    VecFunctions.registerAll(spark)
    // corpus words + adversarial: vocab at start/middle/end, overlaps,
    // multi-byte chars, an astral (surrogate-pair) char, 1-char words
    val words = Seq("the", "nation", "established", "x", "atent", "thing",
      "héllo", "wörld…", "a😀b", "ingestion", "forever", "ndes")
    val df = words.toDF("w").select(
      col("w"),
      VecFunctions.bpe_count(col("w")).as("fast"),
      expr(operators.Text.bpeCountExpr("w")).as("fold"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"'${r.getString(0)}': codegen ${r.getLong(1)} != fold ${r.getLong(2)}")
    }
    // and via SQL
    assert(spark.sql("SELECT bpe_count('ingestion') AS c").head().getLong(0) ==
      df.filter(col("w") === "ingestion").head().getLong(2))
  }

  test("SQL registration: kmv_distinct/misra_gries aggregates callable from spark.sql") {
    VecFunctions.registerAll(spark)
    spark.range(100).selectExpr("id % 7 AS g", "id AS h", "cast(id % 3 AS string) AS w")
      .createOrReplaceTempView("vec_sql_agg_t")
    val r = spark.sql(
      "SELECT kmv_distinct(h, 256) AS nd, misra_gries(w, 2) AS hh " +
        "FROM vec_sql_agg_t").collect().head
    assert(r.getDouble(0) == 100.0) // below k: exact
    assert(r.getSeq[String](1).nonEmpty)
    // analyzer owns DISTINCT/FILTER for registry aggregates — prove FILTER works
    val f = spark.sql(
      "SELECT kmv_distinct(h, 256) FILTER (WHERE h < 10) AS nd FROM vec_sql_agg_t")
      .collect().head
    assert(f.getDouble(0) == 10.0)
  }

  test("optimizer rule rewrites vec_dot(x, x) to vec_norm_sq and preserves values") {
    import org.apache.spark.sql.graft.VecSelfDotRule
    if (!spark.experimental.extraOptimizations.contains(VecSelfDotRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecSelfDotRule
    // non-literal source so constant folding can't collapse the project
    val df = spark.range(1)
      .select(array(col("id").cast("double") + 3.0, lit(4.0)).as("v"))
      .select(VecFunctions.vec_dot(col("v"), col("v")).as("n2"))
    assert(df.queryExecution.optimizedPlan.toString.contains("vec_norm_sq"))
    assert(df.collect().head.getDouble(0) == 25.0)
  }

  test("kmv_distinct: exact below k, estimator above, partition-invariant, partial-agg plan") {
    import org.apache.spark.sql.graft.KmvDistinct
    // below k: exact count, regardless of duplication
    val small = (1L to 40L).flatMap(i => Seq(i, i)).toDF("h")
      .agg(VecFunctions.kmv_distinct(col("h"), 64)).head().getDouble(0)
    assert(small == 40.0)
    // above k: estimator, and the value must not depend on partitioning
    // (merge of partial TreeSet buffers is set-union — order-free)
    // estimator assumes hashes uniform in [0, 2^60): mix with xxhash64
    // and mask to the 60-bit domain, as the query does via md5
    def est(parts: Int): Double =
      (1L to 5000L).toDF("x")
        .select(expr("xxhash64(x) & ((1L << 60) - 1)").as("h"))
        .repartition(parts)
        .agg(VecFunctions.kmv_distinct(col("h"), 64)).head().getDouble(0)
    val e1 = est(1)
    assert(e1 == est(7) && e1 == est(32), "estimate depends on partitioning")
    assert(math.abs(e1 - 5000.0) / 5000.0 < 0.5, s"estimate off: $e1")
    // serialize/deserialize round-trips the buffer
    val agg = KmvDistinct(litL(Array(1L)), 8)
    val buf = agg.createAggregationBuffer()
    Seq(9L, 3L, 7L).foreach(buf.add(_))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
    // the plan does map-side partial aggregation of the sketch
    val df = (1L to 100L).toDF("h").groupBy(lit(1))
      .agg(VecFunctions.kmv_distinct(col("h"), 8))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_kmv_distinct"), p)
  }

  test("misra_gries: heavy items always survive, any partitioning; buffer round-trips") {
    import org.apache.spark.sql.graft.MisraGries
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    // Zipf-ish stream: item i appears 1000/i times, n = sum ~ 7485, k = 9
    // -> guarantee: freq > n/10 = 748.5, i.e. item "w1" (1000) must survive
    // every partitioning; items near the line may or may not.
    val stream = (1 to 20).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    val n = stream.size
    val k = 9
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 20) {
      val shuffled = rnd.shuffle(stream)
      val nParts = 1 + rnd.nextInt(8)
      val agg = MisraGries(BoundReference(0, StringType, nullable = true), k)
      val parts = shuffled.grouped(math.max(1, n / nParts)).map { chunk =>
        val b = agg.createAggregationBuffer()
        chunk.foreach { w =>
          b // update goes through eval(InternalRow); emulate via direct map ops
          val row = org.apache.spark.sql.catalyst.InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(w))
          agg.update(b, row)
        }
        b
      }.toSeq
      // random merge order, with serde round-trip on every partial
      val merged = rnd.shuffle(parts)
        .map(p => agg.deserialize(agg.serialize(p)))
        .reduce((a, b) => agg.merge(a, b))
      val survivors = agg.eval(merged)
        .asInstanceOf[GenericArrayData].array.map(_.toString).toSet
      assert(survivors.size <= k, s"trial $trial: ${survivors.size} > k")
      for (i <- 1 to 20 if 1000 / i > n / (k + 1))
        assert(survivors.contains(s"w$i"), s"trial $trial lost heavy w$i")
    }
    // end-to-end through DataFrame agg: candidates ⊇ heavy hitters
    val df = stream.toDF("w").repartition(5)
      .agg(VecFunctions.misra_gries(col("w"), 9).as("c"))
    val cands = df.collect().head.getSeq[String](0).toSet
    assert(cands.contains("w1"))
    assert(df.queryExecution.executedPlan.toString.contains("partial_misra_gries"))
  }

  test("codegen and interpreted paths agree through DataFrame eval") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(0.5, -1.0, 2.0)),
      (Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0))).toDF("a", "b")
    val viaCodegen = df.select(VecFunctions.vec_dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaCodegen == Seq(1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0, 0.0))
    val sh = Seq(Tuple1(Array(7L, -3L, 12L))).toDF("h")
      .select(VecFunctions.simhash64(col("h")).as("s"))
      .collect().head.getLong(0)
    assert(sh == simhashRef(Array(7L, -3L, 12L)))
  }
}
