package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.core.{Neighbor, TopKAgg, TopKBuf}

/** select_k hardening (SURVEY.md §7.2 step 3): ties, k > n, select-max,
  * merge associativity (the knn_merge_parts property). */
class TopKSuite extends AnyFunSuite {

  private def naive(xs: Seq[(Double, Long)], k: Int, minClose: Boolean): Seq[Neighbor] = {
    val sorted =
      if (minClose) xs.sortBy { case (d, i) => (d, i) }
      else xs.sortBy { case (d, i) => (-d, i) }
    sorted.take(k).map { case (d, i) => Neighbor(i, d) }
  }

  private def viaAgg(xs: Seq[(Double, Long)], k: Int, minClose: Boolean): Seq[Neighbor] = {
    val agg = new TopKAgg(k, minClose)
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    agg.finish(buf)
  }

  test("matches naive sort on random input (min and max close)") {
    val rnd = new Random(42)
    for (_ <- 1 to 50) {
      val xs = Seq.fill(200)((rnd.nextDouble() * 10, rnd.nextLong(1000)))
      assert(viaAgg(xs, 10, minClose = true) == naive(xs, 10, minClose = true))
      assert(viaAgg(xs, 10, minClose = false) == naive(xs, 10, minClose = false))
    }
  }

  test("ties broken by ascending id (deterministic hash-stable output)") {
    val xs = Seq((1.0, 5L), (1.0, 3L), (1.0, 9L), (0.5, 7L), (1.0, 1L))
    assert(viaAgg(xs, 3, minClose = true) ==
      Seq(Neighbor(7, 0.5), Neighbor(1, 1.0), Neighbor(3, 1.0)))
  }

  test("k > n returns all, sorted") {
    val xs = Seq((3.0, 1L), (1.0, 2L), (2.0, 3L))
    assert(viaAgg(xs, 10, minClose = true) ==
      Seq(Neighbor(2, 1.0), Neighbor(3, 2.0), Neighbor(1, 3.0)))
  }

  test("merge associativity == single-pass (knn_merge_parts semantics)") {
    val rnd = new Random(7)
    val agg = new TopKAgg(8, true)
    for (_ <- 1 to 20) {
      val xs = Seq.fill(300)((rnd.nextDouble(), rnd.nextLong(10000)))
      val parts = xs.grouped(70).toSeq
      val merged = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(agg.finish(merged) == viaAgg(xs, 8, minClose = true))
    }
  }

  test("empty buffer finishes empty") {
    val agg = new TopKAgg(5, true)
    assert(agg.finish(agg.zero) == Seq.empty)
  }
}
