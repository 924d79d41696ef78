package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.graphops.{AllNeighbors, CagraOptimize, Components, NnDescent, Spectral}

/** Driver queries + oracles for the graph-construction surface
  * (SURVEY.md §2.6) and the graph algorithms behind dedup/clustering. */
object GraphQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.table(spark, dir, "embeddings")

  private val l2 = (a: String, b: String) =>
    s"sqrt(list_sum(list_transform(list_zip($a, $b), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ^ 2)))"

  // ===== all_neighbors / nn_descent (approximate; recall reported) ======

  private def allNeighborsQuery(spark: SparkSession, dir: String): DataFrame =
    AllNeighbors.build(emb(spark, dir),
        AllNeighbors.Params(k = 10, nClusters = 8, overlapFactor = 2, kmeansIters = 5),
        "vec_id", "embedding")
      .select(col("src"), col("dst"), col("rank"), round(col("dist"), 4).as("dist"))

  private def allNeighborsRecallQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val approx = AllNeighbors.build(e,
      AllNeighbors.Params(k = 10, nClusters = 8, overlapFactor = 2, kmeansIters = 5),
      "vec_id", "embedding")
    val exact = AllNeighbors.exact(e, 10, Metric.L2, "vec_id", "embedding")
    val spark2 = spark
    import spark2.implicits._
    Seq(AllNeighbors.graphRecall(approx, exact)).toDF("recall")
      .select(round(col("recall"), 3).as("recall"))
  }

  private def nnDescentRecallQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 2 === 0)
    val approx = NnDescent.build(e,
      NnDescent.Params(k = 10, maxIterations = 6), "vec_id", "embedding")
    val exact = AllNeighbors.exact(e, 10, Metric.L2, "vec_id", "embedding")
    val spark2 = spark
    import spark2.implicits._
    Seq(AllNeighbors.graphRecall(approx, exact)).toDF("recall")
      .select(round(col("recall"), 3).as("recall"))
  }

  // ===== cagra optimize (deterministic over the exact graph; oracled) ===

  private def cagraOptimizeQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 4 === 0)
    val knn = AllNeighbors.exact(e, 16, Metric.L2Sqrt, "vec_id", "embedding")
    CagraOptimize.optimize(knn.select(col("src"), col("dst"), col("dist")), degree = 8)
      .select(col("src"), col("dst"), col("rank"), round(col("dist"), 4).as("dist"))
  }

  private val cagraOptimizeOracle: String =
    s"""WITH x AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id % 4 = 0),
       |d AS (SELECT a.id AS src, b.id AS dst, ${l2("a.embedding", "b.embedding")} AS dist
       |      FROM x a JOIN x b ON a.id <> b.id),
       |e AS (SELECT src, dst, dist FROM (
       |      SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rk FROM d)
       |      WHERE rk <= 16),
       |det AS (SELECT sd.src, sd.dst, count(*) AS detours
       |      FROM e sd JOIN e sv ON sd.src = sv.src JOIN e vd ON sv.dst = vd.src AND vd.dst = sd.dst
       |      WHERE sv.dist < sd.dist AND vd.dist < sd.dist
       |      GROUP BY sd.src, sd.dst),
       |scored AS (SELECT e.src, e.dst, e.dist, coalesce(det.detours, 0) AS detours
       |      FROM e LEFT JOIN det ON det.src = e.src AND det.dst = e.dst),
       |pruned AS (SELECT src, dst, dist FROM (
       |      SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY detours, dist, dst) AS rk
       |      FROM scored) WHERE rk <= 8),
       |aug AS (SELECT src, dst, min(dist) AS dist FROM (
       |      SELECT src, dst, dist FROM pruned
       |      UNION ALL SELECT dst AS src, src AS dst, dist FROM pruned) GROUP BY 1, 2)
       |SELECT src, dst, rank, round(dist, 4) AS dist FROM (
       |  SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rank FROM aug)
       |WHERE rank <= 8""".stripMargin

  // ===== connected components (deterministic; recursive-CTE oracle) =====

  private def componentsQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val edges = graft.ops.PairwiseDistance.epsNeighborhood(
        e, e, 3.0, Metric.L2Sqrt, "id", "vec", "id", "vec")
      .filter(col("aid") < col("bid"))
      .select(col("aid").as("src"), col("bid").as("dst"))
    Components.connectedComponents(e, edges, "id")
  }

  private val componentsOracle: String =
    s"""WITH RECURSIVE x AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id % 5 = 0),
       |edges AS (SELECT a.id AS src, b.id AS dst FROM x a JOIN x b
       |      ON a.id < b.id AND ${l2("a.vec", "b.vec")} < 3.0),
       |und AS (SELECT src AS a, dst AS b FROM edges
       |      UNION SELECT dst, src FROM edges UNION SELECT id, id FROM x),
       |reach AS (SELECT a, b FROM und
       |      UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
       |SELECT a AS id, min(b) AS component FROM reach GROUP BY a""".stripMargin

  // ===== single linkage / spectral (rows-only + tests) =================

  private def singleLinkageQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val knn = AllNeighbors.exact(e, 15, Metric.L2Sqrt, "id", "vec")
    Components.singleLinkageLabels(e, knn.select(col("src"), col("dst"), col("dist")),
        nClusters = 5, "id")
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
  }

  private def spectralQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Spectral.fitPredict(e, nClusters = 4,
        Spectral.Params(nNeighbors = 10), "id", "vec")
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("n")).as("n_points"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "all_neighbors_graph" -> (allNeighborsQuery(_, _)),
    "all_neighbors_recall" -> (allNeighborsRecallQuery(_, _)),
    "nn_descent_recall" -> (nnDescentRecallQuery(_, _)),
    "cagra_optimize" -> (cagraOptimizeQuery(_, _)),
    "connected_components" -> (componentsQuery(_, _)),
    "single_linkage" -> (singleLinkageQuery(_, _)),
    "spectral_clustering" -> (spectralQuery(_, _)),
  )

  val oracles: Map[String, String] = Map(
    "cagra_optimize" -> cagraOptimizeOracle,
    "connected_components" -> componentsOracle,
  )
}
