package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: break scann_search_refine (12.2s in r3) into build vs search. */
object ScannProbe2 {
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
    val idx8 = t("scann8 build") { graft.index.ScannIndex.build(emb,
      graft.index.ScannIndex.Params(nLeaves = 16, nIters = 10, pqBits = 8),
      "vec_id", "embedding", base = Some(ivf)) }
    t("scann8 lists materialize") { idx8.lists.count() }
    val kCoarse = math.max(150L, emb.count() / 5).toInt
    for (pass <- 1 to 2) {
      t(s"adc_search pass $pass") {
        idx8.search(q, kCoarse, nProbes = 16).count()
      }
      t(s"search_refine pass $pass") {
        idx8.searchWithRefine(q, emb, 10, nProbes = 16, kCoarse = kCoarse,
          idCol = "vec_id", vecCol = "embedding").count()
      }
    }
    spark.stop()
  }
}
