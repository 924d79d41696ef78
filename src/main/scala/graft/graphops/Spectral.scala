package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cluster.KMeans
import graft.core.{Eigen, Metric}

/** Spectral embedding + clustering — `cuvs::preprocessing::
  * spectral_embedding` (spectral_embedding.hpp:28-50: n_components,
  * n_neighbors, norm_laplacian, drop_first) and `cuvs::cluster::spectral`
  * (spectral.hpp:25-45): kNN connectivity graph -> (normalized) Laplacian
  * -> bottom eigenvectors -> k-means on the embedding.
  *
  * The kNN graph is distributed (AllNeighbors); the Laplacian eigensolve
  * collects the COO graph to the driver (dense Jacobi — n ≤ ~2k; the
  * documented hard-case limit of SURVEY.md §7.4(2), with Lanczos as the
  * scale path). The embedding returns as a DataFrame for downstream ops.
  */
object Spectral {

  case class Params(nComponents: Int = 2, nNeighbors: Int = 10,
      normLaplacian: Boolean = true, dropFirst: Boolean = true,
      seed: Long = 42, metric: Metric = Metric.L2)

  /** (id, embedding array<float>) spectral embedding of the kNN graph.
    *
    * The eigensolve is driver-side (the reference also host-solves the
    * analogous steps — SURVEY.md §7.4(2)); for small graphs it is a dense
    * Jacobi, past that a sparse Lanczos on M = 2I − L (O(nnz·steps)
    * instead of the Jacobi's O(n³·sweeps)) — the in-memory twin of
    * [[embeddingLanczos]], which remains the fully distributed path when
    * even the edge list outgrows the driver. */
  def embedding(df: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val knn = AllNeighbors.exact(df, params.nNeighbors, params.metric, idCol, vecCol)
      .select(col("src"), col("dst"))
    // symmetrized 0/1 adjacency
    val adj = knn.unionByName(knn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = df.select(col(idCol).cast("long")).collect().map(_.getLong(0)).sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val deg = new Array[Double](n)
    adj.foreach { case (s, _) => deg(idx(s)) += 1.0 }
    val emb: Array[Array[Float]] =
      if (n <= 64 || !params.normLaplacian) {
        val lap = Array.fill(n, n)(0.0)
        if (params.normLaplacian) {
          for (i <- 0 until n) lap(i)(i) = 1.0
          adj.foreach { case (s, d) =>
            val (i, j) = (idx(s), idx(d))
            lap(i)(j) = -1.0 / math.sqrt(deg(i) * deg(j))
          }
        } else {
          for (i <- 0 until n) lap(i)(i) = deg(i)
          adj.foreach { case (s, d) => lap(idx(s))(idx(d)) = -1.0 }
        }
        val (vals, vecs) = Eigen.symEigen(lap)
        // bottom eigenvectors (Jacobi returns desc -> take from the end)
        val order = vals.indices.sortBy(vals(_))
        val chosen = (if (params.dropFirst) order.drop(1) else order).take(params.nComponents)
        Array.tabulate(n)(i => chosen.map(c => vecs(c)(i).toFloat).toArray)
      } else
        localLanczosBottom(adj.map(t => (idx(t._1), idx(t._2))), deg, ids, params)
    val spark = df.sparkSession
    spark.createDataFrame(ids.zip(emb).toSeq.map { case (id, v) => (id, v.toSeq) })
      .toDF(idCol, "spectral")
      .select(col(idCol), col("spectral").cast("array<float>"))
  }

  /** In-memory block subspace iteration for the bottom eigenvectors of the
    * normalized Laplacian: iterates a (nComponents+4)-wide block under
    * M = 2I − L (dominant pairs of M = bottom of L), with modified
    * Gram-Schmidt re-orthonormalization each step and a final Rayleigh-Ritz
    * rotation. A BLOCK method on purpose: the bottom Laplacian eigenvalue
    * has multiplicity = #connected components, and a single-vector Krylov
    * sweep cannot recover a degenerate eigenspace (it sees only the start
    * vector's one projection onto it) — the component indicators that
    * spectral clustering needs would be lost. O(iters·(nnz·b + n·b²)). */
  private def localLanczosBottom(edges: Array[(Int, Int)], deg: Array[Double],
      ids: Array[Long], params: Params): Array[Array[Float]] = {
    val n = ids.length
    val srcIdx = edges.map(_._1)
    val dstIdx = edges.map(_._2)
    val w = Array.tabulate(edges.length)(e =>
      1.0 / math.sqrt(deg(srcIdx(e)) * deg(dstIdx(e))))
    // Mv = v + Sv (M = 2I − (I − S))
    def matvec(v: Array[Double]): Array[Double] = {
      val out = v.clone()
      var e = 0
      while (e < srcIdx.length) { out(srcIdx(e)) += w(e) * v(dstIdx(e)); e += 1 }
      out
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val b = math.min(n, params.nComponents + 4)
    // deterministic start block from the portable affine hash (per column)
    val p31 = 2147483647L
    var x = Array.tabulate(b) { c =>
      Array.tabulate(n) { i =>
        val h1 = math.floorMod(ids(i) * 1000003L + 12345L + params.seed + 7919L * c, p31)
        val h2 = math.floorMod(h1 * 1000003L + 12345L + params.seed, p31)
        h2.toDouble / p31.toDouble - 0.5
      }
    }
    def orthonormalize(m0: Array[Array[Double]]): Unit = {
      var c = 0
      while (c < m0.length) {
        var j = 0
        while (j < c) {
          val d = dot(m0(c), m0(j))
          var i = 0
          while (i < n) { m0(c)(i) -= d * m0(j)(i); i += 1 }
          j += 1
        }
        val nrm = math.sqrt(dot(m0(c), m0(c)))
        if (nrm > 1e-300) { var i = 0; while (i < n) { m0(c)(i) /= nrm; i += 1 } }
        c += 1
      }
    }
    orthonormalize(x)
    val iters = 120
    var it = 0
    while (it < iters) {
      x = x.map(matvec)
      orthonormalize(x)
      it += 1
    }
    // Rayleigh-Ritz: rotate the converged subspace into eigenvector
    // directions of the projected b×b problem
    val mx = x.map(matvec)
    val t = Array.tabulate(b, b)((i, j) => dot(x(i), mx(j)))
    // symmetrize projection roundoff
    for (i <- 0 until b; j <- i + 1 until b) {
      val v = (t(i)(j) + t(j)(i)) / 2.0; t(i)(j) = v; t(j)(i) = v
    }
    val (tVals, tVecs) = Eigen.symEigen(t)
    // largest Ritz values of M = bottom Laplacian pairs
    val order = tVals.indices.sortBy(i => -tVals(i))
    val chosen = (if (params.dropFirst) order.drop(1) else order).take(params.nComponents)
    Array.tabulate(n) { i =>
      chosen.map { c =>
        var s = 0.0; var j = 0
        while (j < b) { s += tVecs(c)(j) * x(j)(i); j += 1 }
        s.toFloat
      }.toArray
    }
  }

  /** Distributed Lanczos spectral embedding — the scale path past the
    * driver-side Jacobi limit (SURVEY.md §7.4(2)): the n×n Laplacian is
    * never materialized anywhere; each Lanczos step is one distributed
    * matvec over the weighted edge list plus two aggregations, and the
    * only driver-side state is the (m+1)×(m+1) tridiagonal problem.
    *
    * Works on M = 2I − L_norm (spectrum in [0,2] flipped), so the LARGEST
    * Ritz pairs of M are the bottom Laplacian eigenpairs the embedding
    * needs. The Krylov basis lives as columns of one checkpointed
    * DataFrame (id, q0..qm) — full reorthogonalization is a single
    * aggregate of m running dot products, and the Ritz rotation is a
    * map-side linear combination. Rounds: O(m) jobs, m = lanczosSteps.
    */
  def embeddingLanczos(df: DataFrame, params: Params, lanczosSteps: Int = 0,
      idCol: String = "id", vecCol: String = "vec",
      knnGraph: Option[DataFrame] = None): DataFrame = {
    val spark = df.sparkSession
    val wanted = if (lanczosSteps > 0) lanczosSteps
      else math.max(2 * params.nComponents + 2, params.nComponents + 6)
    // the full count only matters when n < wanted (a handful of rows) —
    // probe wanted+1 rows instead of scanning a huge input
    val m =
      if (LocalKernel.within(df, wanted.toLong)) (df.count() - 1).toInt.max(1)
      else wanted
    // `knnGraph` (src, dst) overrides the affinity graph — at scale pass an
    // [[AllNeighbors.build]] graph (cell-bounded) instead of letting this
    // default to the exact O(n^2) self-join, same contract as
    // [[Vamana.build]]'s candidate pool
    val knn = knnGraph.map(_.select(col("src"), col("dst")))
      .getOrElse(AllNeighbors.exact(df, params.nNeighbors, params.metric, idCol, vecCol)
        .select(col("src"), col("dst")))
    val adj = knn.unionByName(knn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val deg = adj.groupBy(col("src").as("id")).agg(count(lit(1)).cast("double").as("deg"))
    // w_ij = 1/sqrt(d_i d_j): (Sv)_i = sum_j w_ij v_j; Mv = v + Sv
    val edges = adj
      .join(deg.select(col("id").as("src"), col("deg").as("_ds")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("_dd")), "dst")
      .select(col("src"), col("dst"), (lit(1.0) / sqrt(col("_ds") * col("_dd"))).as("w"))
      .localCheckpoint()

    // deterministic unit start vector from the portable affine hash
    val p31 = 2147483647L
    val h = pmod(pmod(col("id") * lit(1000003L) + lit(12345L + params.seed), lit(p31))
      * lit(1000003L) + lit(12345L + params.seed), lit(p31))
    var basis = df.select(col(idCol).cast("long").as("id"))
      .withColumn("_r", h.cast("double") / lit(p31.toDouble) - lit(0.5))
    val n0 = math.sqrt(basis.agg(sum(col("_r") * col("_r"))).head().getDouble(0))
    basis = basis.withColumn("q0", col("_r") / lit(n0)).drop("_r").localCheckpoint()

    val alphas = Array.ofDim[Double](m)
    val betas = Array.ofDim[Double](m) // betas(k) links q_k and q_{k+1}
    var steps = 0
    var k = 0
    var break = false
    while (k < m && !break) {
      val qk = s"q$k"
      // matvec: w = q_k + S q_k
      val sv = edges
        .join(basis.select(col("id").as("dst"), col(qk).as("_v")), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("w") * col("_v")).as("_sv"))
      val withW = basis
        .join(sv, Seq("id"), "left")
        .withColumn("_w", col(qk) + coalesce(col("_sv"), lit(0.0)))
        .drop("_sv")
      // full reorthogonalization, done TWICE (CGS2): a single classical
      // Gram-Schmidt pass loses orthogonality past ~20 steps and breeds
      // ghost Ritz values; the second pass restores it to machine level.
      // Each pass is one aggregate of all k+1 running dot products.
      def orthoPass(frame: DataFrame, src: String, accumAlpha: Boolean): DataFrame = {
        val dotCols = (0 to k).map(j => sum(col(src) * col(s"q$j")).as(s"d$j"))
        val dots = frame.agg(dotCols.head, dotCols.tail: _*).head()
        val coeffs = (0 to k).map(j => dots.getDouble(j))
        if (accumAlpha) alphas(k) = coeffs(k)
        frame.withColumn("_o", (0 to k).foldLeft(col(src)) { (acc, j) =>
          acc - lit(coeffs(j)) * col(s"q$j")
        })
      }
      val pass1 = orthoPass(withW, "_w", accumAlpha = true)
        .withColumn("_w1", col("_o")).drop("_o").localCheckpoint()
      val withO = orthoPass(pass1, "_w1", accumAlpha = false).drop("_w1")
      val beta = math.sqrt(withO.agg(sum(col("_o") * col("_o"))).head().getDouble(0))
      steps = k + 1
      if (beta < 1e-12 || k == m - 1) break = true
      else {
        betas(k) = beta
        basis = withO.withColumn(s"q${k + 1}", col("_o") / lit(beta))
          .drop("_w", "_o").localCheckpoint()
        k += 1
      }
    }
    // driver-side tridiagonal eigenproblem (steps x steps)
    val t = Array.fill(steps, steps)(0.0)
    for (i <- 0 until steps) {
      t(i)(i) = alphas(i)
      if (i + 1 < steps) { t(i)(i + 1) = betas(i); t(i + 1)(i) = betas(i) }
    }
    val (tVals, tVecs) = Eigen.symEigen(t)
    // largest Ritz values of M = bottom Laplacian pairs; order ascending L
    val order = tVals.indices.sortBy(i => -tVals(i))
    val chosen = (if (params.dropFirst) order.drop(1) else order).take(params.nComponents)
    // Ritz vectors: u_c = sum_k tVecs(c)(k) q_k — map-side combination
    val comps = chosen.map { c =>
      (0 until steps).foldLeft(lit(0.0)) { (acc, j) =>
        acc + lit(tVecs(c)(j)) * col(s"q$j")
      }.cast("float")
    }
    basis.select(col("id").as(idCol), array(comps: _*).as("spectral"))
  }

  /** Bottom Laplacian eigenvalues per Lanczos (2 − Ritz values), ascending
    * — for validation against the dense path. */
  def lanczosEigenvalues(df: DataFrame, params: Params, lanczosSteps: Int = 0,
      idCol: String = "id", vecCol: String = "vec"): Seq[Double] = {
    val emb = embeddingLanczos(df, params, lanczosSteps, idCol, vecCol)
    // Rayleigh quotients of the returned components under L = I - S
    val knn = AllNeighbors.exact(df, params.nNeighbors, params.metric, idCol, vecCol)
      .select(col("src"), col("dst"))
    val adj = knn.unionByName(knn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = adj.groupBy(col("src").as("id")).agg(count(lit(1)).cast("double").as("deg"))
    val edges = adj
      .join(deg.select(col("id").as("src"), col("deg").as("_ds")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("_dd")), "dst")
      .select(col("src"), col("dst"), (lit(1.0) / sqrt(col("_ds") * col("_dd"))).as("w"))
    (0 until params.nComponents).map { c =>
      val v = emb.select(col(idCol).as("id"),
        element_at(col("spectral"), c + 1).cast("double").as("v"))
      val sv = edges.join(v.select(col("id").as("dst"), col("v").as("_vd")), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("w") * col("_vd")).as("sv"))
      val joined = v.join(sv, Seq("id"), "left")
        .select(col("v"), coalesce(col("sv"), lit(0.0)).as("sv"))
      val r = joined.agg(sum(col("v") * (col("v") - col("sv"))).as("num"),
        sum(col("v") * col("v")).as("den")).head()
      r.getDouble(0) / r.getDouble(1)
    }
  }

  /** Spectral clustering: embedding + k-means, returns (id, cluster).
    * Clusters on the k BOTTOM eigenvectors including the trivial one
    * (dropFirst=false): with c connected components the bottom c vectors
    * span the component indicators, which k-means needs intact. */
  def fitPredict(df: DataFrame, nClusters: Int, params: Params,
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val emb = embedding(df, params.copy(nComponents = nClusters, dropFirst = false),
      idCol, vecCol)
    val model = KMeans.fit(emb, KMeans.Params(nClusters, 20, seed = params.seed),
      idCol, "spectral")
    KMeans.predict(emb, model.centroids, "spectral")
      .select(col(idCol), col("cluster"))
  }
}
