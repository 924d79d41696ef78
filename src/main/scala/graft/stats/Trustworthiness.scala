package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.ops.BruteForceKnn

/** Trustworthiness — `cuvs::stats::trustworthiness_score`
  * (trustworthiness_score.hpp:20-31): how well an embedding preserves
  * local structure. T = 1 - 2/(n*k*(2n-3k-1)) * sum over queries q and
  * over j in kNN_k(q, embedded) \ kNN_k(q, orig) of (rank_orig(q,j) - k).
  *
  * Relational shape: two kNN joins (orig + embedded space, self excluded)
  * -> anti-join the rank lists -> penalty sum. The orig-space ranks come
  * from the full window form (ranks beyond k are needed for the penalty).
  */
object Trustworthiness {

  def score(orig: DataFrame, embedded: DataFrame, k: Int,
      metric: Metric = Metric.L2Sqrt,
      idCol: String = "id", origVecCol: String = "vec", embVecCol: String = "evec"): Double = {
    val n = orig.count()
    val o = orig.select(col(idCol).cast("long").as("id"), col(origVecCol).as("vec"))
    val e = embedded.select(col(idCol).cast("long").as("id"), col(embVecCol).as("vec"))
    // full orig-space ranks (self excluded -> rank over others)
    val qo = o.select(col("id").as("qid"), col("vec").as("qvec"))
    val origRanks = BruteForceKnn.knnJoinWindowForm(o, qo, n.toInt, metric)
      .filter(col("qid") =!= col("nbr_id"))
      .withColumn("orank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("rank"))))
      .select(col("qid"), col("nbr_id"), col("orank"))
    val qe = e.select(col("id").as("qid"), col("vec").as("qvec"))
    val embTopK = BruteForceKnn.knnJoin(e, qe, k + 1, metric)
      .filter(col("qid") =!= col("nbr_id"))
      .withColumn("erank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("rank"))))
      .filter(col("erank") <= k)
      .select(col("qid"), col("nbr_id"))
    val penalty = embTopK.join(origRanks, Seq("qid", "nbr_id"))
      .select(greatest(col("orank") - k, lit(0)).as("p"))
      .agg(coalesce(sum(col("p")), lit(0L))).head().getLong(0)
    1.0 - 2.0 * penalty / (n.toDouble * k * (2.0 * n - 3.0 * k - 1.0))
  }
}
