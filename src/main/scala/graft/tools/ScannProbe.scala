package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric

/** Scratch: break down where scann_recall spends its time at sf0.1. */
object ScannProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).cache()
    emb.count()
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ivf = t("ivf base build") { graft.index.IvfFlatIndex.build(emb,
      graft.index.IvfFlatIndex.Params(nLists = 16, nIters = 10), "vec_id", "embedding") }
    val idx4 = t("scann4 build") { graft.index.ScannIndex.build(emb,
      graft.index.ScannIndex.Params(nLeaves = 16, nIters = 10, pqBits = 4),
      "vec_id", "embedding", base = Some(ivf)) }
    t("scann4 lists materialize") { idx4.lists.count() }
    val exact = t("exact truth") { graft.ops.BruteForceKnn.knnJoin(emb, q, 10,
      Metric.L2, idCol = "vec_id", vecCol = "embedding")
      .select(col("qid"), col("nbr_id")).localCheckpoint() }
    val nQ = q.count() * 10
    for (np <- Seq(6, 8, 10); kc <- Seq(40, 100, 200)) {
      val got = idx4.searchWithRefine(q, emb, 10, nProbes = np,
          kCoarse = kc, idCol = "vec_id", vecCol = "embedding")
        .select(col("qid"), col("nbr_id"))
      val r = graft.core.Recall.matched(got, exact).toDouble / nQ
      println(f"  nProbes=$np kCoarse=$kc recall=$r%.3f")
    }
    spark.stop()
  }
}
