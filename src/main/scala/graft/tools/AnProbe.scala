package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.graphops.AllNeighbors

/** Scratch: step timings for the all_neighbors build + invariant agg. */
object AnProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count()
    time("kmeans_fit") {
      graft.cluster.KMeans.fit(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        graft.cluster.KMeans.Params(8, 5), "id", "vec")
    }
    val g = time("allneighbors_build") {
      AllNeighbors.build(emb,
        AllNeighbors.Params(k = 10, nClusters = 8, overlapFactor = 2, kmeansIters = 5),
        "vec_id", "embedding")
    }
    time("invariant_agg") {
      val e = emb
      val j = g
        .join(e.select(col("vec_id").as("src"), col("embedding").as("_sv")), "src")
        .join(e.select(col("vec_id").as("dst"), col("embedding").as("_dv")), "dst")
        .select(col("src"), col("dst"), col("rank"), col("dist"),
          graft.functions.vector_distance(Metric.L2, col("_sv"), col("_dv")).as("_true"))
      j.groupBy(col("src")).agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
