package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Metric
import graft.expr.CentroidSet
import graft.ops.{BruteForceKnn, Refine}
import graft.prep.ScalarQuantizer

/** IVF-SQ — IVF over int8 scalar-quantized lists (`cuvs::neighbors::
  * ivf_sq`, ivf_sq.hpp:31-62): the IVF-Flat skeleton with 4x-smaller list
  * rows; the code decoder (the ScalarQuantizer inverse, a codegen'd
  * transform lambda) runs inline in the distance computation, so decoded
  * floats never materialize at rest. Same probe structure, same
  * partition-pruned join; `refine` against the raw table recovers the
  * quantization loss (bounded by half a bucket per dimension).
  */
class IvfSqIndex(
    val centroids: CentroidSet,
    val sq: ScalarQuantizer.Model,
    val lists: DataFrame, // (list_id int, id long, codes array<tinyint>)
    val metric: Metric) extends Serializable {

  def search(queries: DataFrame, k: Int, nProbes: Int,
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val probes = queries
      .select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("_qvec"),
        graft.cluster.KMeans.nearestCol(centroids, col(qvecCol), nProbes).as("_probes"))
      .select(col("qid"), col("_qvec"),
        explode(col("_probes").getField("list_id")).as("list_id"))
    val pairs = lists
      .join(broadcast(probes), "list_id")
      .select(col("qid"), col("id").as("_nid"),
        graft.functions.vector_distance(metric, col("_qvec"),
          ScalarQuantizer.inverseCol(col("codes"), sq)).as("dist"))
    BruteForceKnn.topKPerQuery(pairs, k, metric)
  }

  def searchWithRefine(queries: DataFrame, dataset: DataFrame, k: Int, nProbes: Int,
      kCoarse: Int, idCol: String = "id", vecCol: String = "vec",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val cand = search(queries, kCoarse, nProbes, qidCol, qvecCol)
      .select(col("qid"), col("nbr_id").as("id"))
    Refine.refine(cand, dataset, queries, k, metric, idCol, vecCol, qidCol, qvecCol)
  }
}

object IvfSqIndex {
  def build(dataset: DataFrame, params: IvfFlatIndex.Params, quantile: Double = 0.99,
      idCol: String = "id", vecCol: String = "vec",
      base: Option[IvfFlatIndex] = None): IvfSqIndex = {
    val sq = ScalarQuantizer.train(dataset, vecCol, quantile)
    val ivf = base.getOrElse(IvfFlatIndex.build(dataset, params, idCol, vecCol))
    val lists = ivf.lists
      .select(col("list_id"), col("id"),
        ScalarQuantizer.transformCol(col("vec"), sq).as("codes"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new IvfSqIndex(ivf.centroids, sq, lists, params.metric)
  }
}
