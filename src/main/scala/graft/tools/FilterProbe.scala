package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.graphops.{AllNeighbors, CagraOptimize, GraphSearch}

/** Scratch: filtered CAGRA recall sweep across itopk/iters. */
object FilterProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") % 20 === 0).select(col("id").as("qid"), col("vec").as("qvec"))
    val knn = AllNeighbors.exact(e, 16, Metric.L2Sqrt, "id", "vec").localCheckpoint()
    val g = CagraOptimize.optimize(knn.select(col("src"), col("dst"), col("dist")), degree = 8)
      .select(col("src"), col("dst")).localCheckpoint()
    val allow = e.filter(col("id") % 3 =!= 0).select(col("id")).localCheckpoint()
    val exact = graft.ops.BruteForceKnn.knnJoin(
      e.filter(col("id") % 3 =!= 0), q, 10, Metric.L2, "id", "vec")
      .select(col("qid"), col("nbr_id")).localCheckpoint()
    val nQ = q.count()
    for (itopk <- Seq(40, 64, 96); iters <- Seq(10, 16, 24)) {
      val got = GraphSearch.searchFiltered(g, e, q, 10,
        GraphSearch.Params(itopk = itopk, searchWidth = 4, maxIterations = iters),
        allow, "id", "vec")
      val r = graft.core.Recall.matched(got.select(col("qid"), col("nbr_id")), exact).toDouble / (nQ * 10)
      println(f"PROBE itopk=$itopk%3d iters=$iters%2d recall=$r%.4f")
    }
    spark.stop()
  }
}
