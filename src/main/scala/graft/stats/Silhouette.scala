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
  * mean -> split into a (own label) and b (min other). The exact form is
  * O(n^2) pairs, so past `spark.graft.silhouette.exactMaxRows` the route
  * swaps to the reference's batched/sampled compromise
  * (silhouette_score.hpp:78): every point is still scored, but its means
  * are estimated against a deterministic per-cluster sample
  * (`spark.graft.silhouette.samplePerCluster` ids with the smallest
  * (xxhash64(id), id) per label, chosen by the partial top-k aggregator —
  * no per-cluster sort, no full shuffle), making the join
  * O(n * clusters * cap) with a broadcast sample side.
  */
object Silhouette {

  /** Per-point silhouettes: (id, label, a, b, s). Cost-routed (see class
    * doc); below the gate the result is exact. */
  def perPoint(df: DataFrame, metric: Metric = Metric.L2Sqrt,
      idCol: String = "id", vecCol: String = "vec", labelCol: String = "label"): DataFrame = {
    // persisted across the gate count and the pairwise pass, so an
    // expensive upstream plan (e.g. a clustering output) evaluates once
    val x = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
      col(labelCol).cast("int").as("label"))
      .transform(graft.core.Frames.materialize(_))
    try {
      val spark = df.sparkSession
      val exactMax = spark.conf.get("spark.graft.silhouette.exactMaxRows", "20000").toLong
      val res =
        if (x.count() <= exactMax) scores(pairMeans(x, x.as("j"), metric))
        else {
          val cap = spark.conf.get("spark.graft.silhouette.samplePerCluster", "256").toInt
          perPointSampled(x, metric, cap)
        }
      res.localCheckpoint()
    } finally x.unpersist()
  }

  /** Sampled route, exposed for tests; identical output schema. */
  private[graft] def perPointSampled(x: DataFrame, metric: Metric, cap: Int): DataFrame = {
    val sampleIds = x.groupBy(col("label"))
      .agg(graft.core.TopK.topk(cap, minClose = true)(
        xxhash64(col("id")).cast("double"), col("id")).as("nn"))
      .select(explode(col("nn")).as("n"))
      .select(col("n").getField("id").as("id"))
    val sample = x.join(sampleIds, "id")
    scores(pairMeans(x, broadcast(sample).as("j"), metric))
  }

  /** Mean distance from every i to each cluster's representatives. */
  private def pairMeans(x: DataFrame, jSide: DataFrame, metric: Metric): DataFrame =
    x.as("i")
      .crossJoin(jSide)
      .filter(col("i.id") =!= col("j.id"))
      .select(col("i.id").as("id"), col("i.label").as("label"), col("j.label").as("olabel"),
        vector_distance(metric, col("i.vec"), col("j.vec")).as("d"))
      .groupBy(col("id"), col("label"), col("olabel"))
      .agg(avg(col("d")).as("mean_d"))

  private def scores(pairMeans: DataFrame): DataFrame = {
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
