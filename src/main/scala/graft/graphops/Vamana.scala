package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.{Distance, Metric}

/** Vamana (DiskANN) graph build — `cuvs::neighbors::vamana`
  * (vamana.hpp:59-82: graph_degree R=32, visited_size L=64, alpha=1.2).
  *
  * Spark shape (batch, not per-vector insertion): the candidate pool for
  * every node is its exact/approximate L-NN list — the batch analog of the
  * reference's greedy-search visited list — followed by the *robust prune*
  * (alpha-RNG rule: drop candidate c if an already-kept neighbor w has
  * alpha·d(w,c) <= d(p,c)), then reverse-edge augmentation and a second
  * prune to re-cap the degree, exactly the reference's insert round
  * structure (vamana.hpp:66: "each iteration inserts all vectors").
  *
  * The prune is a per-node local computation over <= L candidates: a
  * groupByKey/flatMapGroups whose state is L·dim floats — never a shuffle
  * of anything larger than the candidate edge list. At 100 TB the
  * candidate stage comes from AllNeighbors (cell-bounded) instead of the
  * exact self-join; the prune stage is unchanged.
  */
object Vamana {

  case class Params(graphDegree: Int = 32, visitedSize: Int = 64, alpha: Double = 1.2,
      metric: Metric = Metric.L2Sqrt)

  /** Robust-pruned edge list (src, dst, dist, rank).
    *
    * `candidates` (src, dst, dist) overrides the per-node candidate pool —
    * at scale pass an [[AllNeighbors.build]] graph (cell-bounded) instead
    * of letting this default to the exact L-NN self-join. */
  def build(df: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec",
      candidates: Option[DataFrame] = None): DataFrame = {
    val data = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .transform(graft.core.Frames.materialize(_))
    val cand = candidates
      .getOrElse(AllNeighbors.exact(data, params.visitedSize, params.metric, "id", "vec"))
      .select(col("src"), col("dst"), col("dist"))
    val pruned = robustPrune(cand, data, params)
    // reverse-edge augmentation, then re-cap the degree with a second prune
    val augmented = pruned
      .select(col("src"), col("dst"), col("dist"))
      .unionByName(pruned.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
      .groupBy(col("src"), col("dst")).agg(min(col("dist")).as("dist"))
    val out = robustPrune(augmented, data, params)
    data.unpersist()
    out
  }

  /** Greedy alpha-RNG prune per source node (DiskANN RobustPrune).
    *
    * Cost-based route (graft.graphops.LocalKernel): when the vector table
    * fits under the broadcast threshold, ship it once as a map and shuffle
    * only the bare (src, dst, dist) edges into the per-node groups —
    * instead of joining a dim-wide vector onto every candidate edge and
    * shuffling visited_size·dim floats per node. Above the threshold the
    * join route runs unchanged (the at-scale plan).
    */
  private[graphops] def robustPrune(edges: DataFrame, data: DataFrame,
      params: Params): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val distFn = Distance.fn(params.metric)
    val (degree, alpha) = (params.graphDegree, params.alpha)

    def pruneGroup(src: Long, cand: Array[(Long, Double, Array[Float])]):
        Iterator[(Long, Long, Double, Int)] = {
      val removed = new Array[Boolean](cand.length)
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      var i = 0
      while (i < cand.length && kept.length < degree) {
        if (!removed(i)) {
          val (dst, dist, dvec) = cand(i)
          kept += ((dst, dist))
          var j = i + 1
          while (j < cand.length) {
            if (!removed(j) && alpha * distFn(dvec, cand(j)._3) <= cand(j)._2)
              removed(j) = true
            j += 1
          }
        }
        i += 1
      }
      kept.iterator.zipWithIndex.map { case ((dst, dist), rk) => (src, dst, dist, rk + 1) }
    }

    if (LocalKernel.enabled(spark) &&
        LocalKernel.within(data, LocalKernel.maxVectors(spark))) {
      val vecs = new java.util.HashMap[Long, Array[Float]]()
      data.select(col("id").cast("long"), col("vec"))
        .as[(Long, Array[Float])].collect().foreach { case (i, v) => vecs.put(i, v) }
      val bcVecs = spark.sparkContext.broadcast(vecs)
      edges.select(col("src").cast("long"), col("dst").cast("long"), col("dist").cast("double"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (src, it) =>
          val vs = bcVecs.value
          val cand = it.toArray.sortBy(t => (t._3, t._2)).map(t => (t._2, t._3, vs.get(t._2)))
          pruneGroup(src, cand)
        }
        .toDF("src", "dst", "dist", "rank")
    } else {
      edges
        .join(data.select(col("id").as("dst"), col("vec").as("dvec")), "dst")
        .select(col("src"), col("dst"), col("dist"), col("dvec"))
        .as[(Long, Long, Double, Array[Float])]
        .groupByKey(_._1)
        .flatMapGroups { (src, it) =>
          val cand = it.toArray.sortBy(t => (t._3, t._2)).map(t => (t._2, t._3, t._4))
          pruneGroup(src, cand)
        }
        .toDF("src", "dst", "dist", "rank")
    }
  }
}
