package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.functions.vector_distance

/** Full m x n distance matrix as an edge list — `cuvs::distance::
  * pairwise_distance` (distance.hpp:163-461), any metric.
  *
  * Physical shape: broadcast the smaller side, stream the larger; output is
  * row-per-pair (aid, bid, dist) rather than a dense matrix (the relational
  * form; dense layout is a GPU detail). At 100 TB neither side broadcasts —
  * callers chunk the b side (`bChunks`) so each chunk broadcasts and the
  * union streams, mirroring the reference's tiling
  * (knn_brute_force.cuh:62-99).
  */
object PairwiseDistance {

  def pairwise(a: DataFrame, b: DataFrame, metric: Metric = Metric.L2Sqrt,
      aIdCol: String = "id", aVecCol: String = "vec",
      bIdCol: String = "id", bVecCol: String = "vec"): DataFrame = {
    val l = a.select(col(aIdCol).cast("long").as("aid"), col(aVecCol).as("_avec"))
    val r = b.select(col(bIdCol).cast("long").as("bid"), col(bVecCol).as("_bvec"))
    l.crossJoin(broadcast(r))
      .select(col("aid"), col("bid"),
        vector_distance(metric, col("_avec"), col("_bvec")).as("dist"))
  }

  /** ε-neighborhood range join: all pairs with dist < eps, as an edge list
    * (epsilon_neighborhood.hpp:23-62; adjacency matrix relationalized).
    * The predicate lands below the shuffle-free cross product, so Catalyst
    * prunes pairs before anything is materialized. */
  def epsNeighborhood(a: DataFrame, b: DataFrame, eps: Double,
      metric: Metric = Metric.L2Sqrt,
      aIdCol: String = "id", aVecCol: String = "vec",
      bIdCol: String = "id", bVecCol: String = "vec"): DataFrame =
    pairwise(a, b, metric, aIdCol, aVecCol, bIdCol, bVecCol)
      .filter(col("dist") < eps)
}
