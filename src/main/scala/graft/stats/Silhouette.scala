package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.functions.vector_distance

/** Silhouette score — `cuvs::stats::silhouette_score`
  * (silhouette_score.hpp:32,78): s(i) = (b_i - a_i) / max(a_i, b_i) with
  * a_i = mean intra-cluster distance, b_i = min over other clusters of the
  * mean distance to that cluster.
  *
  * Relational shape: one pairwise join (i != j) -> per (point, other-label)
  * mean -> split into a (own label) and b (min other). O(n^2) pairs like
  * the reference's batched variant; at scale run on a per-cluster sample
  * (the reference offers the same batching compromise).
  */
object Silhouette {

  /** Per-point silhouettes: (id, label, a, b, s). */
  def perPoint(df: DataFrame, metric: Metric = Metric.L2Sqrt,
      idCol: String = "id", vecCol: String = "vec", labelCol: String = "label"): DataFrame = {
    val x = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
      col(labelCol).cast("int").as("label"))
    val pairMeans = x.as("i")
      .crossJoin(x.as("j"))
      .filter(col("i.id") =!= col("j.id"))
      .select(col("i.id").as("id"), col("i.label").as("label"), col("j.label").as("olabel"),
        vector_distance(metric, col("i.vec"), col("j.vec")).as("d"))
      .groupBy(col("id"), col("label"), col("olabel"))
      .agg(avg(col("d")).as("mean_d"))
    val a = pairMeans.filter(col("label") === col("olabel"))
      .select(col("id"), col("label"), col("mean_d").as("a"))
    val b = pairMeans.filter(col("label") =!= col("olabel"))
      .groupBy(col("id")).agg(min(col("mean_d")).as("b"))
    a.join(b, "id")
      .select(col("id"), col("label"), col("a"), col("b"),
        ((col("b") - col("a")) / greatest(col("a"), col("b"))).as("s"))
  }

  /** Mean silhouette over all points. */
  def score(df: DataFrame, metric: Metric = Metric.L2Sqrt,
      idCol: String = "id", vecCol: String = "vec", labelCol: String = "label"): Double =
    perPoint(df, metric, idCol, vecCol, labelCol)
      .agg(avg(col("s"))).head().getDouble(0)
}
