package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.ops.BruteForceKnn

/** Scratch: worst coarse-estimate rank of any true top-10 neighbor, per SF —
  * the kCoarse the refine query actually needs. */
object RabitqProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val idx = graft.index.IvfRabitqIndex.build(emb,
        graft.index.IvfRabitqIndex.Params(nLists = 16, nIters = 10, bitsPerDim = 3),
        "vec_id", "embedding")
      val n = emb.count().toInt
      val coarse = idx.search(q, n, nProbes = 16)
        .select(col("qid"), col("nbr_id"), col("rank").as("crank"))
      val exact = BruteForceKnn.knnJoin(emb, q, 10, Metric.L2, "vec_id", "embedding")
        .select(col("qid"), col("nbr_id"))
      val worst = exact.join(coarse, Seq("qid", "nbr_id"))
        .agg(max(col("crank"))).head().getInt(0)
      println(s"PROBE $dir n=$n worst_coarse_rank_of_true_top10=$worst")
    }
    spark.stop()
  }
}
