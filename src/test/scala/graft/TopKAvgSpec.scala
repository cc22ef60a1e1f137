package graft

import graft.functions.TopKAvgAgg
import org.scalatest.funsuite.AnyFunSuite

/** Bounded top-k-mean buffer semantics (the distributed KNN roll's
  * reducer): k-smallest selection with the (distance, label)
  * deterministic tiebreak, order-insensitive merge, ascending-order
  * mean. */
class TopKAvgSpec extends AnyFunSuite {

  private def feed(agg: TopKAvgAgg, xs: Seq[(Double, Double)]): Array[Double] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("keeps the k smallest by distance and averages their labels") {
    val agg = new TopKAvgAgg(3)
    val b = feed(agg, Seq((5.0, 50.0), (1.0, 10.0), (4.0, 40.0), (2.0, 20.0), (3.0, 30.0)))
    assert(agg.finish(b) == (10.0 + 20.0 + 30.0) / 3)
  }

  test("fewer than k inputs average what exists (small-cell case)") {
    val agg = new TopKAvgAgg(5)
    val b = feed(agg, Seq((2.0, 8.0), (1.0, 4.0)))
    assert(agg.finish(b) == 6.0)
  }

  test("distance ties break toward the smaller label, deterministically") {
    val agg = new TopKAvgAgg(1)
    // same distance, different labels, both insertion orders
    assert(agg.finish(feed(agg, Seq((1.0, 9.0), (1.0, 3.0)))) == 3.0)
    assert(agg.finish(feed(agg, Seq((1.0, 3.0), (1.0, 9.0)))) == 3.0)
  }

  test("merge equals single-stream reduce regardless of the split point") {
    val xs = Seq((3.0, 1.0), (1.0, 7.0), (2.0, 5.0), (1.5, 2.0), (9.0, 9.0), (0.5, 4.0))
    val agg = new TopKAvgAgg(3)
    val whole = feed(agg, xs)
    (0 to xs.length).foreach { cut =>
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(feed(agg, a), feed(agg, b))
      assert(merged.toSeq == whole.toSeq, s"split at $cut")
    }
  }

  test("finish sums labels in ascending (distance, label) order") {
    // three doubles whose sum differs across association orders would
    // be caught by the bitwise IVF-vs-exact spec; here just pin the
    // buffer layout: sorted ascending interleaved pairs
    val agg = new TopKAvgAgg(3)
    val b = feed(agg, Seq((2.0, 20.0), (1.0, 10.0), (3.0, 30.0)))
    assert(b.toSeq == Seq(1.0, 10.0, 2.0, 20.0, 3.0, 30.0))
  }
}
