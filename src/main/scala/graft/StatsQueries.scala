package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.ops.{BruteForceKnn, Kernels}
import graft.stats.{Kde, Silhouette, Trustworthiness}

/** Driver queries + DuckDB oracles for filtered search and the stats
  * surface (KDE, silhouette, trustworthiness, kernel gram). */
object StatsQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.table(spark, dir, "embeddings")

  private def q(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private val l2expr =
    "sqrt(list_sum(list_transform(list_zip(__A__, __B__), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ^ 2)))"
  private def l2(a: String, b: String): String =
    l2expr.replace("__A__", a).replace("__B__", b)
  private def ip(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  // ===== filtered search ===============================================

  private def filteredKnnQuery(spark: SparkSession, dir: String): DataFrame = {
    val deny = emb(spark, dir).filter(col("vec_id") % 3 === 0).select(col("vec_id").as("id"))
    BruteForceKnn.knnJoinFiltered(emb(spark, dir), q(spark, dir), 10, Metric.L2Sqrt,
        deny = Some(deny), idCol = "vec_id", vecCol = "embedding")
      .select(col("qid"), col("nbr_id"), col("rank"), round(col("dist"), 4).as("dist"))
  }

  private val filteredKnnOracle: String =
    s"""WITH qq AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 20 = 0),
       |d AS (SELECT qq.qid, e.vec_id AS id, ${l2("qq.qvec", "e.embedding")} AS dist
       |      FROM qq CROSS JOIN embeddings e WHERE e.vec_id % 3 <> 0),
       |r AS (SELECT qid, id, dist,
       |      row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS rank FROM d)
       |SELECT qid, id AS nbr_id, rank, round(dist, 4) AS dist FROM r WHERE rank <= 10""".stripMargin

  // ===== KDE ===========================================================

  private def kdeQuery(kernel: Kde.Kernel)(spark: SparkSession, dir: String): DataFrame =
    Kde.logDensity(q(spark, dir), emb(spark, dir), bandwidth = 3.0, kernel,
        vecCol = "embedding")
      .select(col("qid"), round(col("log_density"), 4).as("log_density"))

  private def kdeOracle(wExpr: String): String =
    s"""WITH qq AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 20 = 0),
       |w AS (SELECT qq.qid, $wExpr AS w
       |      FROM qq CROSS JOIN embeddings e)
       |SELECT qid, round(ln(sum(w)), 4) AS log_density FROM w GROUP BY qid""".stripMargin

  private def kdeGaussianOracle: String = {
    val d = l2("qq.qvec", "e.embedding")
    kdeOracle(s"exp($d * $d * (-1.0 / 18.0))")
  }

  private def kdeEpanechnikovOracle: String = {
    val d = l2("qq.qvec", "e.embedding")
    kdeOracle(s"CASE WHEN $d < 3.0 THEN 1.0 - ($d * $d) / 9.0 ELSE 0.0 END")
  }

  // The remaining four DensityKernelType members (distance.hpp:93-100).
  // Queries are dataset rows, so compact kernels always see the self-pair
  // at d = 0 and sum(w) >= 1 (ln never hits 0).
  private def kdeTophatOracle: String = {
    val d = l2("qq.qvec", "e.embedding")
    kdeOracle(s"CASE WHEN $d < 3.0 THEN 1.0 ELSE 0.0 END")
  }

  private def kdeExponentialOracle: String = {
    val d = l2("qq.qvec", "e.embedding")
    kdeOracle(s"exp(-$d / 3.0)")
  }

  private def kdeLinearOracle: String = {
    val d = l2("qq.qvec", "e.embedding")
    kdeOracle(s"CASE WHEN $d < 3.0 THEN 1.0 - $d / 3.0 ELSE 0.0 END")
  }

  private def kdeCosineOracle: String = {
    val d = l2("qq.qvec", "e.embedding")
    kdeOracle(s"CASE WHEN $d < 3.0 THEN cos($d * (pi() / 2.0 / 3.0)) ELSE 0.0 END")
  }

  // ===== silhouette ====================================================

  private def silhouetteQuery(spark: SparkSession, dir: String): DataFrame =
    Silhouette.perPoint(emb(spark, dir), Metric.L2Sqrt, "vec_id", "embedding", "label")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), round(avg(col("s")), 4).as("mean_s"))

  private val silhouetteOracle: String =
    s"""WITH pm AS (SELECT i.vec_id AS id, i.label AS label, j.label AS olabel,
       |        avg(${l2("i.embedding", "j.embedding")}) AS mean_d
       |      FROM embeddings i JOIN embeddings j ON i.vec_id <> j.vec_id
       |      GROUP BY 1, 2, 3),
       |a AS (SELECT id, label, mean_d AS a FROM pm WHERE label = olabel),
       |b AS (SELECT id, min(mean_d) AS b FROM pm WHERE label <> olabel GROUP BY 1),
       |s AS (SELECT a.label, (b.b - a.a) / greatest(a.a, b.b) AS s
       |      FROM a JOIN b ON a.id = b.id)
       |SELECT label, count(*) AS n, round(avg(s), 4) AS mean_s FROM s GROUP BY label""".stripMargin

  // ===== trustworthiness ===============================================

  private def trustQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val orig = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val embd = e.select(col("vec_id").as("id"), slice(col("embedding"), 1, 8).as("evec"))
    val t = Trustworthiness.score(orig, embd, k = 5, Metric.L2Sqrt, "id", "vec", "evec")
    val spark2 = spark
    import spark2.implicits._
    Seq(t).toDF("t").select(round(col("t"), 4).as("t"))
  }

  private val trustOracle: String =
    s"""WITH x AS (SELECT vec_id AS id, embedding AS vec, embedding[1:8] AS evec FROM embeddings),
       |n AS (SELECT count(*) AS n FROM x),
       |orr AS (SELECT a.id AS qid, b.id AS nid,
       |      row_number() OVER (PARTITION BY a.id ORDER BY ${l2("a.vec", "b.vec")} ASC, b.id ASC) AS orank
       |      FROM x a JOIN x b ON a.id <> b.id),
       |er AS (SELECT a.id AS qid, b.id AS nid,
       |      row_number() OVER (PARTITION BY a.id ORDER BY ${l2("a.evec", "b.evec")} ASC, b.id ASC) AS erank
       |      FROM x a JOIN x b ON a.id <> b.id),
       |pen AS (SELECT sum(greatest(orank - 5, 0)) AS p
       |      FROM (SELECT qid, nid FROM er WHERE erank <= 5) e JOIN orr USING (qid, nid))
       |SELECT round(1.0 - 2.0 * pen.p / (n.n * 5.0 * (2.0 * n.n - 16.0)), 4) AS t
       |FROM pen, n""".stripMargin

  // ===== kernel gram ===================================================

  private def gramQuery(spark: SparkSession, dir: String): DataFrame = {
    val a = emb(spark, dir).filter(col("vec_id") % 25 === 0)
    val b = emb(spark, dir).filter(col("vec_id") % 7 === 0)
    Kernels.gram(a, b, Kernels.Linear, "vec_id", "embedding", "vec_id", "embedding")
      .withColumnRenamed("k", "k_linear")
      .join(Kernels.gram(a, b, Kernels.Polynomial(3, 1.0, 1.0),
        "vec_id", "embedding", "vec_id", "embedding").withColumnRenamed("k", "k_poly"),
        Seq("aid", "bid"))
      .join(Kernels.gram(a, b, Kernels.Rbf(0.1),
        "vec_id", "embedding", "vec_id", "embedding").withColumnRenamed("k", "k_rbf"),
        Seq("aid", "bid"))
      .join(Kernels.gram(a, b, Kernels.Tanh(0.5, 1.0),
        "vec_id", "embedding", "vec_id", "embedding").withColumnRenamed("k", "k_tanh"),
        Seq("aid", "bid"))
      .select(col("aid"), col("bid"), round(col("k_linear"), 4).as("k_linear"),
        round(col("k_poly"), 4).as("k_poly"), round(col("k_rbf"), 4).as("k_rbf"),
        round(col("k_tanh"), 4).as("k_tanh"))
  }

  private val gramOracle: String = {
    val ipab = ip("a.avec", "b.bvec")
    val l2sq = s"list_sum(list_transform(list_zip(a.avec, b.bvec), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ^ 2))"
    s"""WITH a AS (SELECT vec_id AS aid, embedding AS avec FROM embeddings WHERE vec_id % 25 = 0),
       |b AS (SELECT vec_id AS bid, embedding AS bvec FROM embeddings WHERE vec_id % 7 = 0)
       |SELECT a.aid, b.bid,
       |  round($ipab, 4) + 0.0 AS k_linear,
       |  round(pow($ipab * 1.0 + 1.0, 3), 4) + 0.0 AS k_poly,
       |  round(exp($l2sq * -0.1), 4) + 0.0 AS k_rbf,
       |  round((exp(2.0 * ($ipab * 0.5 + 1.0)) - 1.0) / (exp(2.0 * ($ipab * 0.5 + 1.0)) + 1.0), 4) + 0.0 AS k_tanh
       |FROM a CROSS JOIN b""".stripMargin
  }

  /** One ball-cover index per dataset — shared by the eps and kNN gates. */
  private def ballCoverIndex(spark: SparkSession, dir: String): graft.ops.BallCover.Index =
    SparkEntry.memoize(spark, s"ballcover:$dir") {
      graft.ops.BallCover.build(emb(spark, dir), nLandmarks = 16,
        idCol = "vec_id", vecCol = "embedding")
    }

  /** Ball-cover eps search — pruning is lossless, so the oracle is the
    * plain brute-force eps join. */
  private def ballCoverQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val idx = ballCoverIndex(spark, dir)
    graft.ops.BallCover.epsNeighbors(idx,
        e.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")), 3.0)
      .select(col("qid"), col("id").as("bid"), round(col("dist"), 4).as("dist"))
  }

  private val ballCoverOracle: String =
    s"""WITH a AS (SELECT vec_id AS qid, embedding AS avec FROM embeddings WHERE vec_id % 10 = 0)
       |SELECT a.qid, e.vec_id AS bid, round(${l2("a.avec", "e.embedding")}, 4) AS dist
       |FROM a CROSS JOIN embeddings e
       |WHERE ${l2("a.avec", "e.embedding")} < 3.0""".stripMargin

  /** Ball-cover kNN — the two-phase bound+prune is lossless, so the oracle
    * is the plain exact-kNN window form on the standard workload. */
  private def ballCoverKnnQuery(spark: SparkSession, dir: String): DataFrame = {
    val idx = ballCoverIndex(spark, dir)
    graft.ops.BallCover.knn(idx, q(spark, dir), 10)
      .select(col("qid"), col("nbr_id"), col("rank"), round(col("dist"), 4).as("dist"))
  }

  private val ballCoverKnnOracle: String =
    s"""WITH qq AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 20 = 0),
       |d AS (SELECT qq.qid, e.vec_id AS id, ${l2("qq.qvec", "e.embedding")} AS dist
       |      FROM qq CROSS JOIN embeddings e),
       |r AS (SELECT qid, id, dist,
       |      row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS rank FROM d)
       |SELECT qid, id AS nbr_id, rank, round(dist, 4) AS dist FROM r WHERE rank <= 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ball_cover_eps" -> (ballCoverQuery(_, _)),
    "ball_cover_knn" -> (ballCoverKnnQuery(_, _)),
    "knn_filtered" -> (filteredKnnQuery(_, _)),
    "kde_gaussian" -> (kdeQuery(Kde.Gaussian)(_, _)),
    "kde_epanechnikov" -> (kdeQuery(Kde.Epanechnikov)(_, _)),
    "kde_tophat" -> (kdeQuery(Kde.Tophat)(_, _)),
    "kde_exponential" -> (kdeQuery(Kde.Exponential)(_, _)),
    "kde_linear" -> (kdeQuery(Kde.Linear)(_, _)),
    "kde_cosine" -> (kdeQuery(Kde.CosineK)(_, _)),
    "silhouette" -> (silhouetteQuery(_, _)),
    "trustworthiness" -> (trustQuery(_, _)),
    "kernel_gram" -> (gramQuery(_, _)),
  )

  val oracles: Map[String, String] = Map(
    "ball_cover_eps" -> ballCoverOracle,
    "ball_cover_knn" -> ballCoverKnnOracle,
    "knn_filtered" -> filteredKnnOracle,
    "kde_gaussian" -> kdeGaussianOracle,
    "kde_epanechnikov" -> kdeEpanechnikovOracle,
    "kde_tophat" -> kdeTophatOracle,
    "kde_exponential" -> kdeExponentialOracle,
    "kde_linear" -> kdeLinearOracle,
    "kde_cosine" -> kdeCosineOracle,
    "silhouette" -> silhouetteOracle,
    "trustworthiness" -> trustOracle,
    "kernel_gram" -> gramOracle,
  )
}
