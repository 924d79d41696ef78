package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.index.IvfRabitqIndex
import graft.ops.BruteForceKnn

/** Scratch recall probe for pinning RaBitQ query configs (not shipped). */
object RabitqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = BruteForceKnn.knnJoin(emb, q, 10, Metric.L2, "vec_id", "embedding")
      .select(col("qid"), col("nbr_id")).cache()
    val nq = q.count()
    if (args.length < 2 || args(1) == "rabitq")
      for (bits <- Seq(1, 3, 5); (probes, kc) <- Seq((8, 40), (16, 40), (16, 100))) {
        val idx = IvfRabitqIndex.build(emb,
          IvfRabitqIndex.Params(nLists = 16, nIters = 10, bitsPerDim = bits), "vec_id", "embedding")
        val est = idx.search(q, kc, probes).select(col("qid"), col("nbr_id"))
          .intersect(exact).count().toDouble / (nq * 10)
        val ref = idx.searchWithRefine(q, emb, 10, probes, kc, "vec_id", "embedding")
          .select(col("qid"), col("nbr_id")).intersect(exact).count().toDouble / (nq * 10)
        println(f"bits=$bits probes=$probes kCoarse=$kc estTop10InCoarse=$est%.3f refined=$ref%.3f")
      }
    if (args.length < 2 || args(1) == "scann")
      for (pqBits <- Seq(4, 8); (probes, kc) <- Seq((6, 40), (16, 60), (16, 100))) {
        val idx = graft.index.ScannIndex.build(emb,
          graft.index.ScannIndex.Params(nLeaves = 16, nIters = 10, pqBits = pqBits),
          "vec_id", "embedding")
        val ref = idx.searchWithRefine(q, emb, 10, probes, kc, "vec_id", "embedding")
          .select(col("qid"), col("nbr_id")).intersect(exact).count().toDouble / (nq * 10)
        println(f"scann pqBits=$pqBits probes=$probes kCoarse=$kc refined=$ref%.3f")
      }
    spark.stop()
  }
}
