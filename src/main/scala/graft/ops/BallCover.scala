package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.cluster.KMeans
import graft.core.Metric

/** Random-ball-cover pruning for ε-neighborhood search —
  * `cuvs::neighbors::ball_cover` (ball_cover.hpp:38-60: ~sqrt(m)
  * landmarks, triangle-inequality pruning; eps_nn at :247,:276).
  *
  * Build: ~sqrt(m) landmarks (k-means centers), every point assigned to
  * its nearest landmark with the distance cached; per-landmark radius =
  * max member distance. Search: a query only probes landmarks with
  * d(q, L) <= eps + radius_L (triangle inequality — LOSSLESS, so results
  * equal the brute-force eps join exactly), then exact-checks members of
  * surviving balls. Metric must satisfy the triangle inequality (L2Sqrt).
  *
  * 100 TB posture: same partition-pruned-join shape as IVF — the member
  * table is keyed by landmark and never shuffles at query time; per-query
  * work scales with the balls actually intersected.
  */
object BallCover {

  case class Index(centroids: graft.expr.CentroidSet,
      radii: Map[Int, Double], members: DataFrame /* (lm, id, vec, dlm) */)

  def build(df: DataFrame, nLandmarks: Int, kmeansIters: Int = 5, seed: Long = 42,
      idCol: String = "id", vecCol: String = "vec"): Index = {
    val model = KMeans.fit(df,
      KMeans.Params(nLandmarks, kmeansIters, seed = seed, metric = Metric.L2Sqrt),
      idCol, vecCol)
    val (lm, d) = KMeans.assignCols(model.centroids, col(vecCol))
    val members = df.select(lm.as("lm"), col(idCol).cast("long").as("id"),
        col(vecCol).as("vec"), d.as("dlm"))
      .repartition(col("lm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val radii = members.groupBy(col("lm")).agg(max(col("dlm")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    Index(model.centroids, radii, members)
  }

  /** All (qid, id, dist) with dist < eps — identical to the brute-force
    * eps join, with only intersecting balls scanned. */
  def epsNeighbors(index: Index, queries: DataFrame, eps: Double,
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val spark = queries.sparkSession
    val radii = spark.createDataFrame(index.radii.toSeq).toDF("lm", "radius")
    // d(q, L) for every landmark via the all-centroids expression
    val k = index.centroids.k
    val ql = queries
      .select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("_qvec"),
        explode(KMeans.nearestCol(index.centroids, col(qvecCol), k)).as("nc"))
      .select(col("qid"), col("_qvec"),
        col("nc.list_id").as("lm"), col("nc.dist").as("dql"))
      .join(broadcast(radii), "lm")
      .filter(col("dql") <= col("radius") + eps) // triangle-inequality prune
      .select(col("qid"), col("_qvec"), col("lm"))
    index.members
      .join(broadcast(ql), "lm")
      .select(col("qid"), col("id"),
        graft.functions.vector_distance(Metric.L2Sqrt, col("_qvec"), col("vec")).as("dist"))
      .filter(col("dist") < eps)
      // a point sits in ONE ball, so no dedup is needed
  }
}
