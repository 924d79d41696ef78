package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.core.{Distance, Metric}

/** Metric axioms (SURVEY.md §5 adopted strategy (d)): symmetry, identity,
  * ordering — mirroring the reference's property discipline
  * (cpp/tests/neighbors/naive_knn.cuh scalar forms). Seeded random sweeps
  * (reference pins RngState{0}, kmeans.hpp:89). */
class DistanceSuite extends AnyFunSuite {

  private def vecs(rnd: Random, lo: Float, hi: Float): Array[Float] =
    Array.fill(16)(lo + rnd.nextFloat() * (hi - lo))

  private val symmetric = Seq(Metric.L2, Metric.L2Sqrt, Metric.InnerProduct,
    Metric.Cosine, Metric.L1, Metric.Linf, Metric.Canberra, Metric.Correlation,
    Metric.Jaccard, Metric.BrayCurtis, Metric.JensenShannon, Metric.Hamming,
    Metric.RusselRao, Metric.Dice)

  test("symmetry d(a,b) == d(b,a)") {
    val rnd = new Random(0)
    for (_ <- 1 to 100; m <- symmetric) {
      val a = vecs(rnd, -1f, 1f); val b = vecs(rnd, -1f, 1f)
      val f = Distance.fn(m)
      assert(math.abs(f(a, b) - f(b, a)) < 1e-9, s"metric $m")
    }
  }

  test("identity d(x,x) == 0 for true distances") {
    val rnd = new Random(1)
    val zeroAtSelf = Seq(Metric.L2, Metric.L2Sqrt, Metric.L1, Metric.Linf,
      Metric.Canberra, Metric.BrayCurtis, Metric.Hamming, Metric.Jaccard,
      Metric.JensenShannon, Metric.KLDivergence)
    for (_ <- 1 to 100; m <- zeroAtSelf) {
      val a = vecs(rnd, 0.01f, 1f)
      assert(math.abs(Distance.fn(m)(a, a)) < 1e-6, s"metric $m")
    }
  }

  test("non-negativity for true distances on positive data") {
    val rnd = new Random(2)
    for (_ <- 1 to 100; m <- Seq(Metric.L2, Metric.L2Sqrt, Metric.L1, Metric.Linf,
        Metric.Canberra, Metric.BrayCurtis, Metric.Hamming, Metric.Hellinger,
        Metric.JensenShannon, Metric.Jaccard)) {
      val a = vecs(rnd, 0.01f, 1f); val b = vecs(rnd, 0.01f, 1f)
      assert(Distance.fn(m)(a, b) >= -1e-12, s"metric $m")
    }
  }

  test("isMinClose: only InnerProduct is larger-is-closer (distance.hpp:72-85)") {
    assert(!Metric.isMinClose(Metric.InnerProduct))
    assert(Metric.all.filterNot(_ == Metric.InnerProduct).forall(Metric.isMinClose))
  }

  test("l2 expanded == unexpanded (norm trick sanity)") {
    val rnd = new Random(3)
    for (_ <- 1 to 100) {
      val a = vecs(rnd, -1f, 1f); val b = vecs(rnd, -1f, 1f)
      val direct = Distance.l2(a, b)
      val na = a.map(x => x.toDouble * x).sum
      val nb = b.map(x => x.toDouble * x).sum
      val expanded = na + nb - 2 * Distance.innerProduct(a, b)
      assert(math.abs(direct - expanded) < 1e-6)
    }
  }

  test("lp(2) == l2sqrt, lp(1) == l1") {
    val rnd = new Random(4)
    for (_ <- 1 to 50) {
      val a = vecs(rnd, -1f, 1f); val b = vecs(rnd, -1f, 1f)
      assert(math.abs(Distance.lp(a, b, 2.0) - Distance.l2Sqrt(a, b)) < 1e-9)
      assert(math.abs(Distance.lp(a, b, 1.0) - Distance.l1(a, b)) < 1e-9)
    }
  }

  test("haversine: quarter circumference") {
    val pole = Array((math.Pi / 2).toFloat, 0f)
    val equator = Array(0f, 0f)
    assert(math.abs(Distance.haversine(pole, equator) - math.Pi / 2) < 1e-4)
  }

  test("bitwiseHamming popcount") {
    assert(Distance.bitwiseHamming(Array[Byte](0x0F, 0x00), Array[Byte](0x00, 0x00)) == 4.0)
    assert(Distance.bitwiseHamming(Array[Byte](-1), Array[Byte](0)) == 8.0)
    assert(Distance.bitwiseHamming(Array[Byte](0x55), Array[Byte](0x55)) == 0.0)
  }

  test("cosine of a vector with itself is 0") {
    val rnd = new Random(5)
    for (_ <- 1 to 100) {
      val a = vecs(rnd, -1f, 1f)
      if (Distance.norm(a) > 1e-3) assert(math.abs(Distance.cosine(a, a)) < 1e-6)
    }
  }
}
