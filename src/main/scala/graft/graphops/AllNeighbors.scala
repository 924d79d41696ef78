package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.cluster.KMeans
import graft.core.Metric
import graft.ops.BruteForceKnn

/** Partitioned kNN-graph build — `cuvs::neighbors::all_neighbors`
  * (all_neighbors.hpp:29-95): cluster rows into `nClusters` cells, assign
  * each row to its `overlapFactor` nearest cells, build a local exact kNN
  * graph inside every cell, merge per-node top-k globally.
  *
  * This is THE scalable kNN-graph primitive (and the dedup workhorse,
  * SURVEY.md §2.6): the quadratic join happens only within cells
  * (n^2/c per cell), cells are Spark partitions (groupBy cell), and the
  * merge is the same top-k aggregator as everything else. overlap_factor=2
  * default mirrors the reference.
  */
object AllNeighbors {

  case class Params(k: Int = 10, nClusters: Int = 16, overlapFactor: Int = 2,
      kmeansIters: Int = 10, seed: Long = 42, metric: Metric = Metric.L2)

  /** Edge list (src, dst, dist, rank), rank 1..k best-first, self excluded. */
  def build(df: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val data = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = KMeans.fit(data,
      KMeans.Params(params.nClusters, params.kmeansIters, seed = params.seed,
        metric = params.metric), "id", "vec")
    val assigned = data
      .select(col("id"), col("vec"),
        explode(KMeans.nearestCol(model.centroids, col("vec"), params.overlapFactor)
          .getField("list_id")).as("cell"))
    // Local exact kNN per cell (the reference's per-batch local graph,
    // all_neighbors.hpp:29-95): each cell's rows land on one task via
    // groupByKey — the same per-cell materialization the within-cell hash
    // join implies — and a fused select_k kernel emits only k candidates
    // per (node, cell) into the global merge. The alternative (self-join on
    // cell + distinct + aggregate) shuffles the full within-cell cross
    // product; this shuffles |rows|·overlap·k. Cell size is bounded by
    // choosing nClusters ~ n/targetCellSize — the reference's own contract.
    val spark = df.sparkSession
    import spark.implicits._
    val distFn = graft.core.Distance.fn(params.metric)
    val minClose = Metric.isMinClose(params.metric)
    val symmetric = params.metric != Metric.KLDivergence
    val k = params.k
    val localKnn = assigned
      .select(col("cell"), col("id"), col("vec"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        val m = rows.length
        val bufs = Array.fill(m)(graft.core.TopKBuf(k, minClose,
          new Array[Double](k), new Array[Long](k), 0))
        var i = 0
        while (i < m) {
          val vi = rows(i)._3
          var j = i + 1
          while (j < m) {
            val d = distFn(vi, rows(j)._3)
            bufs(i).insert(d, rows(j)._2)
            bufs(j).insert(if (symmetric) d else distFn(rows(j)._3, vi), rows(i)._2)
            j += 1
          }
          i += 1
        }
        bufs.iterator.zipWithIndex.flatMap { case (buf, i) =>
          (0 until buf.size).iterator.map(j => (rows(i)._2, buf.ids(j), buf.dists(j)))
        }
      }
      .toDF("qid", "_nid", "dist")
      .distinct() // a pair can co-occur in up to overlapFactor shared cells
    val res = BruteForceKnn.topKPerQuery(localKnn, params.k, params.metric)
      .select(col("qid").as("src"), col("nbr_id").as("dst"), col("dist"), col("rank"))
    data.unpersist()
    res
  }

  /** Exact kNN graph (the oracle / small-scale path): brute-force self-join. */
  def exact(df: DataFrame, k: Int, metric: Metric = Metric.L2,
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val q = df.select(col(idCol).cast("long").as("qid"), col(vecCol).as("qvec"))
    BruteForceKnn.knnJoin(df, q, k + 1, metric, idCol, vecCol)
      .filter(col("qid") =!= col("nbr_id"))
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("rank"))))
      .filter(col("rank") <= k)
      .select(col("qid").as("src"), col("nbr_id").as("dst"), col("dist"), col("rank"))
  }

  /** Recall of an approximate kNN graph vs the exact one. */
  def graphRecall(approx: DataFrame, exact: DataFrame): Double =
    graft.core.Recall.vsExact(
      approx.select(col("src"), col("dst")), exact.select(col("src"), col("dst")))
}
