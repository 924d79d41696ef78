package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.ops.BruteForceKnn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 that ships gets a `queries` entry here;
  * SQL-expressible ones also get a DuckDB oracle in `oracleSql`. Float
  * outputs are rounded (4dp) on BOTH sides so cross-engine accumulation
  * order can't flip the hash.
  */
object SparkEntry {

  private[graft] def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Default query workload: every 20th embedding vector. */
  private def embQueries(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def knnQuery(metric: Metric, k: Int = 10)(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    BruteForceKnn.knnJoin(emb, embQueries(spark, dir), k, metric,
        idCol = "vec_id", vecCol = "embedding")
      .select(col("qid"), col("nbr_id"), col("rank"), round(col("dist"), 4).as("dist"))
  }

  /** DuckDB SQL for exact kNN over embeddings — window form of select_k. */
  private def knnOracle(distExpr: String, k: Int = 10, minClose: Boolean = true): String = {
    val dir = if (minClose) "ASC" else "DESC"
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 20 = 0),
       |d AS (SELECT q.qid, e.vec_id AS id, $distExpr AS dist
       |      FROM q CROSS JOIN embeddings e),
       |r AS (SELECT qid, id, dist,
       |      row_number() OVER (PARTITION BY qid ORDER BY dist $dir, id ASC) AS rank FROM d)
       |SELECT qid, id AS nbr_id, rank, round(dist, 4) AS dist FROM r WHERE rank <= $k
       |""".stripMargin
  }

  private val l2SqlExpr =
    "sqrt(list_sum(list_transform(list_zip(q.qvec, e.embedding), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ^ 2)))"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    knnQuery(Metric.L2Sqrt)(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_bruteforce_l2" -> knnQuery(Metric.L2Sqrt),
    "q1_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n"))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "knn_bruteforce_l2" -> knnOracle(l2SqlExpr),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
  )
}
