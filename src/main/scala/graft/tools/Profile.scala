package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.ops.BruteForceKnn

/** Scratch profiling harness: step timings for a single bench query. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count()
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    // warmup pass
    time("warm_exact") {
      BruteForceKnn.knnJoin(emb, q, 10, Metric.L2, idCol = "vec_id", vecCol = "embedding").count()
    }

    val idx = time("ivf_build") {
      graft.index.IvfFlatIndex.build(emb,
        graft.index.IvfFlatIndex.Params(nLists = 16, nIters = 10), "vec_id", "embedding")
    }
    val approx = time("ivf_search_action") {
      val a = idx.search(q, 10, nProbes = 8).select(col("qid"), col("nbr_id"))
      a.count(); a
    }
    val exact = time("exact_action") {
      val e = BruteForceKnn.knnJoin(emb, q, 10, Metric.L2,
        idCol = "vec_id", vecCol = "embedding").select(col("qid"), col("nbr_id"))
      e.count(); e
    }
    time("intersect_count") { approx.intersect(exact).count() }
    time("qcount") { q.count() }
    time("final_agg") {
      q.agg(count(lit(1)).as("n_queries")).select(col("n_queries"), lit(10).as("k")).count()
    }
    spark.stop()
  }
}
