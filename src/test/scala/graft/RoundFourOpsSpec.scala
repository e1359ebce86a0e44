package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 additions beyond the driver oracle gate: invariants the
  * hash-compare can't express (algebraic identities, cross-query
  * consistency, determinism).
  */
class RoundFourOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  test("flow_retention_cohort: offset 0 is the full cohort (retention 1.0), later offsets never exceed it") {
    val rows = operators.Flow.queries("flow_retention_cohort")(s, dir).collect()
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (wk, rs) =>
      val zero = rs.find(_.getLong(1) == 0L)
      assert(zero.isDefined, s"cohort $wk missing offset 0")
      assert(zero.get.getDouble(4) == 1.0, s"cohort $wk offset-0 retention != 1")
      val size = zero.get.getLong(3)
      assert(rs.forall(_.getLong(2) <= size), s"cohort $wk has offset with n_active > cohort_size")
    }
  }

  test("cdc_diff_snapshots classes partition the synthetic change set exactly") {
    val diff = operators.Flow.queries("cdc_diff_snapshots")(s, dir)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables(s, dir, "orders")
    val removed = o.filter(col("o_orderkey") % 11 === 0).count()
    val added = o.filter(col("o_orderkey") % 13 === 0).count()
    val changed = o.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 11 =!= 0).count()
    assert(diff("removed") == removed, s"$diff vs removed=$removed")
    assert(diff("added") == added, s"$diff vs added=$added")
    assert(diff("changed") == changed, s"$diff vs changed=$changed")
  }

  test("win_count_distinct running count is non-decreasing and ends at the partition total") {
    val rows = operators.Analytic.queries("win_count_distinct")(s, dir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val run = rs.map(_.getLong(2)) // already ordered by (user, event_id)
      assert(run.zip(run.tail).forall { case (a, b) => a <= b },
        s"user $u running distinct count decreased")
      assert(run.last == rs.head.getLong(3), s"user $u running count != total")
    }
  }

  test("dedup_editdist pairs are symmetric-safe (doc_a < doc_b) and within threshold") {
    val rows = operators.Dedup.queries("dedup_editdist")(s, dir).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getLong(2) <= 8))
  }

  test("graph_bfs_khop: hop-0 rows are exactly the sources; neighbors of a source are at hop <= 1") {
    val d = operators.Graph.queries("graph_bfs_khop")(s, dir)
    val byHop = d.groupBy("hops").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byHop.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    val sources = d.filter(col("hops") === 0).select("part").collect().map(_.getLong(0)).toSet
    assert(sources.nonEmpty && sources.forall(_ % 97 == 0))
    // every source's direct co-order neighbor must be reached at hop <= 1
    val pl = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val nbrs = pl.as("a").join(pl.as("b"), col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
      .filter(col("a.p").isin(sources.toSeq: _*))
      .select(col("b.p")).distinct().collect().map(_.getLong(0)).toSet
    val within1 = d.filter(col("hops") <= 1).select("part").collect().map(_.getLong(0)).toSet
    assert(nbrs.subsetOf(within1), s"${(nbrs -- within1).take(5)} missed at hop 1")
  }

  test("mm_phash group sizes are consistent: sum of distinct group sizes equals corpus size") {
    val rows = operators.Multimodal.queries("mm_phash")(s, dir).collect()
    assert(rows.length == Tables(s, dir, "documents").count())
    val byHash = rows.groupBy(_.getLong(1))
    byHash.foreach { case (h, rs) =>
      assert(rs.forall(_.getLong(2) == rs.length), s"phash $h n_same mismatch")
    }
  }
}
