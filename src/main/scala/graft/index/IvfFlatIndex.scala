package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.cluster.KMeans
import graft.core.Metric
import graft.expr.CentroidSet
import graft.ops.BruteForceKnn

/** IVF-Flat index as a *table layout*, not an opaque blob (SURVEY.md §1.1):
  * a vectors table keyed by `list_id` (one inverted list per k-means cell,
  * ivf_flat.hpp:26-81) plus a small centroid set.
  *
  * Search is the flagship partition-pruned join (ivf_flat_search.cuh:41-303
  * mapped in SURVEY.md §2.3): per query, pick the `nProbes` nearest
  * centroids map-side (coarse select_k), then equi-join ONLY those lists and
  * top-k the scanned candidates. Cell pruning ≅ partition pruning: on a
  * saved index (partitionBy(list_id) parquet) the broadcast-hash join on
  * `list_id` triggers dynamic partition pruning, so untouched lists are
  * never read — the Spark twin of `ivfflat_interleaved_scan` touching only
  * probed lists.
  *
  * 100 TB posture: the index table is the big side and never shuffles at
  * search time (probes broadcast); build shuffles once (repartition by
  * list_id ≅ the reference's list construction). `extend` appends new rows
  * assigned to existing cells without retraining (ivf_flat.hpp:60-67
  * add_data_on_build/adaptive_centers analog, centers held fixed).
  */
class IvfFlatIndex(
    val centroids: CentroidSet,
    val lists: DataFrame, // (list_id int, id long, vec array<float>)
    val metric: Metric) extends Serializable {

  /** (qid, nbr_id, rank, dist) for the top-k of each query, scanning only
    * nProbes lists per query. */
  def search(queries: DataFrame, k: Int, nProbes: Int,
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val probes = queries
      .select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("_qvec"),
        KMeans.nearestCol(centroids, col(qvecCol), nProbes).as("_probes"))
      .select(col("qid"), col("_qvec"), explode(col("_probes").getField("list_id")).as("list_id"))
    val pairs = lists
      .join(broadcast(probes), "list_id")
      .select(col("qid"), col("id").as("_nid"),
        graft.functions.vector_distance(metric, col("_qvec"), col("vec")).as("dist"))
    BruteForceKnn.topKPerQuery(pairs, k, metric)
  }

  /** Pre-filtered view of the index (`cuvs::neighbors::filtering` on the
    * IVF path): the predicate applies to the list rows (id/vec), so it
    * pushes into the list scan — deny-listed rows are never scored. The
    * cell layout and centroids are untouched; at full probes the filtered
    * search equals exact kNN over the allowed subset. */
  def filtered(predicate: Column): IvfFlatIndex =
    new IvfFlatIndex(centroids, lists.filter(predicate), metric)

  /** Append new vectors to existing cells (centers fixed) — ivf extend. */
  def extend(newData: DataFrame, idCol: String = "id", vecCol: String = "vec"): IvfFlatIndex = {
    val assigned = IvfFlatIndex.assign(newData, centroids, idCol, vecCol)
    new IvfFlatIndex(centroids, lists.unionByName(assigned), metric)
  }

  /** Persist as a partitioned table — serialize (brute_force.hpp:728-925
    * analog; Parquet instead of a versioned binary stream). */
  def save(path: String): Unit = {
    lists.write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
    IvfFlatIndex.saveCentroids(lists.sparkSession, path, centroids, metric)
  }
}

object IvfFlatIndex {

  case class Params(nLists: Int = 1024, nIters: Int = 20,
      trainFraction: Double = 0.5, seed: Long = 42, metric: Metric = Metric.L2)

  private[index] def assign(df: DataFrame, centroids: CentroidSet,
      idCol: String, vecCol: String): DataFrame = {
    val (cl, _) = KMeans.assignCols(centroids, col(vecCol))
    df.select(cl.as("list_id"), col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
  }

  /** Train cells on a seeded sample (kmeans_trainset_fraction=0.5,
    * ivf_flat.hpp:31-33), assign every row, co-locate lists. */
  def build(dataset: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec"): IvfFlatIndex = {
    val trainset =
      if (params.trainFraction >= 1.0) dataset
      else dataset.filter(
        pmod(xxhash64(col(idCol), lit(params.seed)), lit(1000)) < (params.trainFraction * 1000).toInt)
    val model = KMeans.fit(trainset,
      KMeans.Params(params.nLists, params.nIters, seed = params.seed, metric = params.metric),
      idCol, vecCol)
    val lists = assign(dataset, model.centroids, idCol, vecCol)
      .repartition(col("list_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new IvfFlatIndex(model.centroids, lists, params.metric)
  }

  private[index] def loadCentroids(spark: SparkSession, path: String): (CentroidSet, Metric) = {
    val cdf = spark.read.parquet(s"$path/centroids").orderBy("list_id").collect()
    val dim = cdf.head.getAs[Int]("dim")
    val metric = Metric.fromName(cdf.head.getAs[String]("metric"))
    val flat = new Array[Float](cdf.length * dim)
    cdf.foreach { r =>
      val v = r.getSeq[Float](r.fieldIndex("centroid")).toArray
      System.arraycopy(v, 0, flat, r.getAs[Int]("list_id") * dim, dim)
    }
    (CentroidSet(flat, cdf.length, dim, metric.name), metric)
  }

  private[index] def saveCentroids(spark: SparkSession, path: String,
      centroids: CentroidSet, metric: Metric): Unit = {
    import spark.implicits._
    centroids.centroids.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toSeq, metric.name, centroids.dim) }
      .toDF("list_id", "centroid", "metric", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def load(spark: SparkSession, path: String): IvfFlatIndex = {
    val (centroids, metric) = loadCentroids(spark, path)
    new IvfFlatIndex(centroids, spark.read.parquet(s"$path/lists"), metric)
  }
}
