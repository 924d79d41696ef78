package graft

import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.stats.Silhouette

class SilhouetteSuite extends SparkFunSuite {

  private lazy val labeled = spark.read
    .parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))

  test("exact silhouettes are in [-1, 1] and separate the labeled clusters") {
    val s = Silhouette.score(labeled)
    assert(s >= -1.0 && s <= 1.0)
    val pp = Silhouette.perPoint(labeled).collect()
    assert(pp.length > 0)
    assert(pp.forall { r =>
      val v = r.getAs[Double]("s"); v >= -1.0 && v <= 1.0
    })
  }

  test("sampled route engages past the row gate and tracks the exact score") {
    val exact = Silhouette.score(labeled)
    // with the cap at >= cluster size the sample is every point - identical
    val full = Silhouette.perPointSampled(
      labeled.select(col("id").cast("long").as("id"), col("vec"),
        col("label").cast("int").as("label")),
      Metric.L2Sqrt, cap = 100000)
      .agg(avg(col("s"))).head().getDouble(0)
    assert(math.abs(full - exact) < 1e-9, s"full-cap sampled $full vs exact $exact")
    // auto-route: force the gate low so perPoint takes the sampled path on
    // this >gate input, with a real per-cluster cap
    spark.conf.set("spark.graft.silhouette.exactMaxRows", "10")
    spark.conf.set("spark.graft.silhouette.samplePerCluster", "64")
    try {
      val sampled = Silhouette.score(labeled)
      // a 64-per-cluster estimate of the means stays close to the truth
      assert(math.abs(sampled - exact) < 0.15, s"sampled $sampled vs exact $exact")
    } finally {
      spark.conf.unset("spark.graft.silhouette.exactMaxRows")
      spark.conf.unset("spark.graft.silhouette.samplePerCluster")
    }
  }
}
