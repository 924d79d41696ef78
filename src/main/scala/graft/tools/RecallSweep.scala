package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.graphops.{AllNeighbors, NnDescent}

/** Scratch: sweep IVF-PQ reorder depth and NN-descent iterations vs the
  * recall floors the driver queries assert. */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).cache()
    val n = emb.count()
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val nQ = q.count() * 10
    val exact = graft.ops.BruteForceKnn.knnJoin(emb, q, 10, Metric.L2,
        idCol = "vec_id", vecCol = "embedding")
      .select(col("qid"), col("nbr_id")).localCheckpoint()

    val ivf = graft.index.IvfFlatIndex.build(emb,
      graft.index.IvfFlatIndex.Params(nLists = 16, nIters = 10), "vec_id", "embedding")
    val pq = graft.index.IvfPqIndex.build(emb,
      graft.index.IvfPqIndex.Params(nLists = 16, nIters = 10, pqDim = 8, pqBits = 6),
      "vec_id", "embedding", base = Some(ivf))
    for (kc <- Seq(40, math.max(60, n / 10).toInt, math.max(100, n / 5).toInt)) {
      val approx = pq.searchWithRefine(q, emb, 10, nProbes = 8, kCoarse = kc,
          idCol = "vec_id", vecCol = "embedding").select(col("qid"), col("nbr_id"))
      val r = graft.core.Recall.matched(approx, exact).toDouble / nQ
      println(f"  ivfpq nProbes=8 kCoarse=$kc recall=$r%.3f")
    }

    val e2 = emb.filter(col("vec_id") % 2 === 0)
    val exact2 = AllNeighbors.exact(e2, 10, Metric.L2, "vec_id", "embedding")
    for (it <- Seq(3, 4, 5, 6)) {
      val t0 = System.nanoTime()
      val g = NnDescent.build(e2,
        NnDescent.Params(k = 20, maxIterations = it, terminationThreshold = 0.0),
        "vec_id", "embedding")
      val r = AllNeighbors.graphRecall(g.filter(col("rank") <= 10), exact2)
      println(f"  nndescent buildK=20 iters=$it top10-recall=$r%.3f t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
