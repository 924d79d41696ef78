package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.ops.BruteForceKnn

/** Scratch: worst coarse rank of any true top-10 neighbor for every
  * refine-backed index query, per SF — validates each query's kCoarse. */
object RefineMarginProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val n = emb.count().toInt
      val exact = BruteForceKnn.knnJoin(emb, q, 10, Metric.L2, "vec_id", "embedding")
        .select(col("qid"), col("nbr_id")).localCheckpoint()
      def worst(name: String, coarse: org.apache.spark.sql.DataFrame): Unit = {
        val w = exact.join(coarse.select(col("qid"), col("nbr_id"), col("rank").as("crank")),
            Seq("qid", "nbr_id"), "left")
          .agg(max(coalesce(col("crank"), lit(999999)))).head().getInt(0)
        println(s"PROBE $dir n=$n $name worst=$w")
      }
      val sq = graft.index.IvfSqIndex.build(emb,
        graft.index.IvfFlatIndex.Params(nLists = 16, nIters = 10), idCol = "vec_id",
        vecCol = "embedding")
      worst("ivf_sq(k30)", sq.search(q, n, nProbes = 16))
      val scann = graft.index.ScannIndex.build(emb,
        graft.index.ScannIndex.Params(nLeaves = 16, nIters = 10, pqBits = 8),
        "vec_id", "embedding")
      worst("scann8(k100)", scann.search(q, n, nProbes = 16))
      val pq = graft.index.IvfPqIndex.build(emb,
        graft.index.IvfPqIndex.Params(nLists = 16, nIters = 10, pqDim = 8, pqBits = 6),
        "vec_id", "embedding")
      worst("ivf_pq6(k40,rows-only)", pq.search(q, n, nProbes = 16))
      val pq8 = graft.index.IvfPqIndex.build(emb,
        graft.index.IvfPqIndex.Params(nLists = 16, nIters = 10, pqDim = 8, pqBits = 8),
        "vec_id", "embedding")
      worst("ivf_pq8", pq8.search(q, n, nProbes = 16))
    }
    spark.stop()
  }
}
