package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-11 batch — properties the DuckDB
  * hash gate cannot see. Headliners: the k-truss peel must genuinely
  * reach its fixpoint (re-checking survivors with an INDEPENDENT
  * in-memory support count, not the loop's own bookkeeping), and the
  * truss family must nest.
  */
class RoundElevenOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.sf

  private def survivors(k: Int): Set[(Long, Long)] =
    operators.Graph.ktrussPeel(s, dir, k).collect()
      .filter(_.getLong(2) == 0L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("graph_ktruss reaches the true fixpoint: survivor supports recounted independently") {
    val rows = SparkEntry.queries("graph_ktruss")(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val surv = rows.filter(_._3 == 0L).map(t => (t._1, t._2)).toSet
    assert(surv.nonEmpty, "vacuous: no 4-truss survivors at this sf")
    assert(rows.exists(_._3 > 0L), "vacuous: nothing peeled at this sf")
    // independent fixpoint check: count each survivor edge's triangles
    // WITHIN the survivor set from scratch (plain Scala, no Spark) —
    // every support must be ≥ k − 2 = 2, else the loop stopped early
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    surv.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    surv.foreach { case (u, v) =>
      val support = (adj(u) & adj(v)).size
      assert(support >= 2, s"survivor ($u,$v) has support $support < 2 — not a fixpoint")
    }
    // and the peel was not lazy: every removed edge really was below
    // threshold in the graph state of its round — spot-check the LAST
    // round's removals against the survivor-adjacent state: a last-round
    // removal must have support < 2 within (survivors ∪ last-round set)
    val lastRound = rows.map(_._3).max
    val lastSet = rows.filter(_._3 == lastRound).map(t => (t._1, t._2)).toSet
    val stateEdges = surv ++ lastSet
    val adj2 = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    stateEdges.foreach { case (u, v) =>
      adj2(u) = adj2(u) + v; adj2(v) = adj2(v) + u
    }
    lastSet.foreach { case (u, v) =>
      val support = (adj2(u) & adj2(v)).size
      assert(support < 2,
        s"($u,$v) was removed in round $lastRound but had support $support ≥ 2 then")
    }
  }

  test("truss nesting: the 5-truss is contained in the 4-truss") {
    val s4 = survivors(4)
    val s5 = survivors(5)
    assert(s5.nonEmpty, "vacuous: empty 5-truss")
    assert(s5.subsetOf(s4),
      s"5-truss escapes the 4-truss: ${(s5 -- s4).take(3)}")
  }
}
