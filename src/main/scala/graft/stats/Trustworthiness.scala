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
    val qe = e.select(col("id").as("qid"), col("vec").as("qvec"))
    val embTopK = BruteForceKnn.knnJoin(e, qe, k + 1, metric)
      .filter(col("qid") =!= col("nbr_id"))
      .withColumn("erank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("rank"))))
      .filter(col("erank") <= k)
      .select(col("qid"), col("nbr_id"))
    // Only the orig-space ranks of those n·k pairs are needed, and each is
    // a closer-count: orank(q,j) among others = 1 + #{b != q : (d_qb, b)
    // <lex (d_qj, j)} — the row_number tie-break mirrored as a counting
    // aggregate. This replaces the full n² window sort (all ranks
    // materialized + shuffled) with one broadcast-join aggregation whose
    // groups are the n·k pairs; the n² distance evaluations remain
    // embarrassingly parallel over the dataset side.
    val pairs = embTopK
      .join(o.select(col("id").as("qid"), col("vec").as("_qvec")), "qid")
      .join(o.select(col("id").as("nbr_id"), col("vec").as("_jvec")), "nbr_id")
      .select(col("qid"), col("nbr_id"),
        graft.functions.vector_distance(metric, col("_qvec"), col("_jvec")).as("_dqj"),
        col("_qvec"))
    val db = graft.functions.vector_distance(metric, col("_qvec"), col("vec"))
    val closer = if (Metric.isMinClose(metric))
      db < col("_dqj") || (db === col("_dqj") && col("id") < col("nbr_id"))
    else
      db > col("_dqj") || (db === col("_dqj") && col("id") < col("nbr_id"))
    val oranks = o.crossJoin(broadcast(pairs))
      .filter(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("nbr_id"))
      .agg((sum(when(closer, 1L).otherwise(0L)) + 1L).as("orank"))
    val penalty = oranks
      .select(greatest(col("orank") - k, lit(0L)).as("p"))
      .agg(coalesce(sum(col("p")), lit(0L))).head().getLong(0)
    1.0 - 2.0 * penalty / (n.toDouble * k * (2.0 * n - 3.0 * k - 1.0))
  }
}
