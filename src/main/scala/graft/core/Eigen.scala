package graft.core

/** Cyclic Jacobi eigensolver for small symmetric matrices (d up to a few
  * hundred — PCA covariance, spectral Laplacians on coarsened graphs).
  * Driver-side by design: the reference also eigensolves host-side for the
  * analogous steps (agglomerative.hpp:238 builds dendrograms on host).
  */
object Eigen {

  /** Returns (eigenvalues desc, eigenvectors as rows, matching order). */
  def symEigen(a: Array[Array[Double]], maxSweeps: Int = 64, tol: Double = 1e-12)
      : (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val m = Array.tabulate(n, n)((i, j) => a(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        val mi = m(i)
        while (j < n) { s += mi(j) * mi(j); j += 1 }
        i += 1
      }
      s
    }

    var sweep = 0
    while (sweep < maxSweeps && off() > tol) {
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) {
          if (math.abs(m(p)(q)) > 1e-300) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * m(p)(q))
            // sign(0) must be +1 here: equal diagonal entries need the full
            // 45-degree rotation, not a no-op
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // rotate rows/cols p,q of m
            var i = 0
            while (i < n) {
              val mi = m(i)
              val mip = mi(p); val miq = mi(q)
              mi(p) = c * mip - s * miq
              mi(q) = s * mip + c * miq
              i += 1
            }
            val mp = m(p); val mq = m(q)
            i = 0
            while (i < n) {
              val mpi = mp(i); val mqi = mq(i)
              mp(i) = c * mpi - s * mqi
              mq(i) = s * mpi + c * mqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vi = v(i)
              val vip = vi(p); val viq = vi(q)
              vi(p) = c * vip - s * viq
              vi(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -m(i)(i))
    val vals = order.map(i => m(i)(i)).toArray
    val vecs = order.map(i => Array.tabulate(n)(j => v(j)(i))).toArray
    // deterministic sign: largest-|component| entry is positive
    vecs.foreach { w =>
      val k = w.indices.maxBy(i => math.abs(w(i)))
      if (w(k) < 0) w.indices.foreach(i => w(i) = -w(i))
    }
    (vals, vecs)
  }
}
