package graft

import org.apache.spark.sql.graft.TopKBuffer
import org.scalatest.funsuite.AnyFunSuite

class TopKBufSpec extends AnyFunSuite {
  test("buffer keeps k largest with (value desc, key asc) order") {
    val b = new TopKBuffer(3)
    Seq((914.4, 144L), (915.9, 159L), (900.0, 1L), (910.0, 7L), (915.9, 2L))
      .foreach { case (v, k) => b.add(v, k) }
    assert(b.sorted == Seq((915.9, 2L), (915.9, 159L), (914.4, 144L)))
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val xs = Seq.fill(30)((rnd.nextInt(10).toDouble, rnd.nextLong().abs))
      val bb = new TopKBuffer(5)
      xs.foreach { case (v, k) => bb.add(v, k) }
      // note: buffer keeps duplicates; compare against non-distinct sort
      val wantDup = xs.sortBy { case (v, k) => (-v, k) }.take(5)
      assert(bb.sorted == wantDup, s"xs=$xs")
    }
  }
}
