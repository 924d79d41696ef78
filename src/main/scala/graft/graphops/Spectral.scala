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

  /** (id, embedding array<float>) spectral embedding of the kNN graph. */
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
    val emb = Array.tabulate(n)(i => chosen.map(c => vecs(c)(i).toFloat).toArray)
    val spark = df.sparkSession
    spark.createDataFrame(ids.zip(emb).toSeq.map { case (id, v) => (id, v.toSeq) })
      .toDF(idCol, "spectral")
      .select(col(idCol), col("spectral").cast("array<float>"))
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
