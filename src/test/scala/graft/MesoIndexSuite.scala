package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import graft.expr.{CentroidOps, CentroidSet, MesoIndex}

/** The mesocluster prune must be EXACT: same ids, same (bitwise) distances,
  * same order as the flat scan, for every supported metric, including ties
  * from duplicated centroids. No SparkSession needed — this pins the
  * expression kernel itself. */
class MesoIndexSuite extends AnyFunSuite {

  private val dim = 24
  private val k = 700 // >= MesoIndex.minK so the index engages

  private def mkCentroids(seed: Long): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    val flat = Array.fill(k * dim)((rnd.nextDouble() * 4 - 2).toFloat)
    // duplicated centroids: exercise zero radii and cross-meso ties
    for (c <- Seq(100, 350, 699); i <- 0 until dim)
      flat(c * dim + i) = flat(7 * dim + i)
    flat
  }

  private def queries(seed: Long): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val qs = Seq.fill(200)(Array.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat))
    val flat = mkCentroids(11L)
    // exact centroid hits (hardest tie case: d == 0 at 4 duplicated ids)
    val dup = Array.tabulate(dim)(i => flat(7 * dim + i))
    qs ++ Seq(dup, Array.fill(dim)(0.0f))
  }

  private def run(cs: CentroidSet, v: Array[Float], p: Int): Seq[(Int, Double)] = {
    val out = CentroidOps.nearest(cs, new GenericArrayData(v), p)
    (0 until out.numElements()).map { i =>
      val r = out.get(i, null).asInstanceOf[InternalRow]
      (r.getInt(0), r.getDouble(1))
    }
  }

  private def runFlat(cs: CentroidSet, v: Array[Float], p: Int): Seq[(Int, Double)] = {
    val out = CentroidOps.nearestFlat(cs, v, p)
    (0 until out.numElements()).map { i =>
      val r = out.get(i, null).asInstanceOf[InternalRow]
      (r.getInt(0), r.getDouble(1))
    }
  }

  for (metric <- Seq("l2", "l2sqrt", "l1", "cosine")) {
    test(s"pruned == flat, bit for bit, metric=$metric") {
      val cs = CentroidSet(mkCentroids(11L), k, dim, metric)
      assert(cs.mesoIndex != null, "meso index should engage at k=700")
      for (v <- queries(23L); p <- Seq(1, 5, 33)) {
        val got = run(cs, v, p)
        val want = runFlat(cs, v, p)
        assert(got == want, s"p=$p v0=${v(0)}: $got != $want")
      }
    }
  }

  // The cosine slack is empirically pinned at dim=24 and derived as
  // sqrt(dim)-scaled past it — this high-dim case (1536, embedding-sized)
  // pins the derived margin: rounding error in the float-normalized prune
  // points grows with dim, and exactness must survive it.
  test("pruned == flat at high dim (1536), metric=cosine and l2") {
    val hiDim = 1536
    val hiK = 600
    val rnd = new scala.util.Random(7L)
    val flat = Array.fill(hiK * hiDim)((rnd.nextDouble() * 2 - 1).toFloat)
    for (i <- 0 until hiDim) flat(123 * hiDim + i) = flat(9 * hiDim + i)
    val qs = Seq.fill(40)(Array.fill(hiDim)((rnd.nextDouble() * 2 - 1).toFloat)) ++
      Seq(Array.tabulate(hiDim)(i => flat(9 * hiDim + i)), Array.fill(hiDim)(0.0f))
    for (metric <- Seq("cosine", "l2")) {
      val cs = CentroidSet(flat.clone(), hiK, hiDim, metric)
      assert(cs.mesoIndex != null, s"meso index should engage at k=$hiK")
      for (v <- qs; p <- Seq(1, 17)) {
        assert(run(cs, v, p) == runFlat(cs, v, p), s"metric=$metric p=$p")
      }
    }
  }

  test("no meso index for inner product or small k") {
    assert(CentroidSet(mkCentroids(1L), k, dim, "ip").mesoIndex == null)
    val smallK = MesoIndex.minK - 1
    val flat = mkCentroids(1L).take(smallK * dim)
    assert(CentroidSet(flat, smallK, dim, "l2").mesoIndex == null)
  }

  test("meso members partition the centroid set") {
    val cs = CentroidSet(mkCentroids(5L), k, dim, "l2")
    val mi = cs.mesoIndex
    val all = mi.members.flatten.sorted
    assert(all.toSeq == (0 until k), "members must cover every centroid once")
    assert(mi.radius.forall(_ >= 0.0))
  }
}
