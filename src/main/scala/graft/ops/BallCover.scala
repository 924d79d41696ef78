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

  /** Exact kNN via the two-phase random-ball-cover discipline
    * (ball_cover.hpp:38-60 kNN side):
    *   1. scan the members of each query's `probeLandmarks` nearest balls
    *      — when they hold >= k rows, their kth best distance is an upper
    *      bound b_q on the true kth distance (else b_q = inf, no pruning);
    *   2. triangle prune: a ball L can hold a closer neighbor only if
    *      d(q, L) - r_L <= b_q (every member x has d(q,x) >= d(q,L) - r_L);
    *      exact-scan the surviving balls and take the final top-k.
    * LOSSLESS for triangle-inequality metrics (L2Sqrt): any true neighbor
    * x in ball L has d(q,L) - r_L <= d(q,x) <= b_q, so its ball always
    * survives the filter (<= keeps equal-distance id tie-breaks exact). */
  def knn(index: Index, queries: DataFrame, k: Int, probeLandmarks: Int = 2,
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val spark = queries.sparkSession
    val radii = spark.createDataFrame(index.radii.toSeq).toDF("lm", "radius")
    val nLm = index.centroids.k
    // every (query, landmark) distance, rank-ordered (one map-side pass)
    val ql = queries
      .select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("_qvec"),
        posexplode(KMeans.nearestCol(index.centroids, col(qvecCol), nLm))
          .as(Seq("pos", "nc")))
      .select(col("qid"), col("_qvec"),
        col("nc.list_id").as("lm"), col("nc.dist").as("dql"), col("pos"))
      .localCheckpoint()
    // phase 1: per-query top-k over the nearest balls' members. Any true
    // neighbor living in a probed ball is necessarily inside this top-k,
    // so phase 2 skips the probed balls entirely and unions this result
    // back in (each id sits in ONE ball — the union is duplicate-free).
    val probe1 = ql.filter(col("pos") < probeLandmarks).select(col("qid"), col("_qvec"), col("lm"))
    val cand1 = index.members
      .join(broadcast(probe1), "lm")
      .select(col("qid"), col("id").as("_nid"),
        graft.functions.vector_distance(Metric.L2Sqrt, col("_qvec"), col("vec")).as("dist"))
    val top1 = BruteForceKnn.topKPerQuery(cand1, k, Metric.L2Sqrt).localCheckpoint()
    val bound = top1
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("_n"), max(col("dist")).as("_kth"))
      .select(col("qid"),
        when(col("_n") >= k, col("_kth")).otherwise(lit(Double.MaxValue)).as("b"))
    // phase 2: scan every unprobed ball that could still hold a closer
    // neighbor. LEFT join: a query whose probed balls were all empty has
    // no bound row at all — it must scan everything (b = inf), not vanish.
    val balls2 = ql.filter(col("pos") >= probeLandmarks)
      .join(broadcast(bound), Seq("qid"), "left")
      .join(broadcast(radii), "lm")
      .filter(col("dql") - col("radius") <= coalesce(col("b"), lit(Double.MaxValue)))
      .select(col("qid"), col("_qvec"), col("lm"))
    val pairs2 = index.members
      .join(broadcast(balls2), "lm")
      .select(col("qid"), col("id").as("_nid"),
        graft.functions.vector_distance(Metric.L2Sqrt, col("_qvec"), col("vec")).as("dist"))
    BruteForceKnn.topKPerQuery(
      pairs2.unionByName(top1.select(col("qid"), col("nbr_id").as("_nid"), col("dist"))),
      k, Metric.L2Sqrt)
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
