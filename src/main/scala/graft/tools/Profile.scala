package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.ops.BruteForceKnn

/** Scratch profiling harness: step timings for slow bench queries. */
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
    val e = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    time("warm_exact") {
      BruteForceKnn.knnJoin(emb, q, 10, Metric.L2, idCol = "vec_id", vecCol = "embedding").count()
    }

    // ===== scann =====
    val sidx = time("scann_build_8bit") {
      graft.index.ScannIndex.build(emb,
        graft.index.ScannIndex.Params(nLeaves = 16, nIters = 10, pqBits = 8),
        "vec_id", "embedding")
    }
    time("scann_search_refine") {
      sidx.searchWithRefine(q, emb, 10, nProbes = 16, kCoarse = 100,
        idCol = "vec_id", vecCol = "embedding").count()
    }

    // ===== hnsw =====
    val base = time("exact16") {
      graft.graphops.AllNeighbors.exact(e, 16, Metric.L2Sqrt, "id", "vec").localCheckpoint()
    }
    val hidx = time("hnsw_fromGraph") {
      graft.index.Hnsw.fromGraph(base, e, graft.index.Hnsw.Params(m = 16), "id", "vec")
    }
    time("hnsw_search") {
      graft.index.Hnsw.search(hidx, e, q, 10, ef = 40, "id", "vec").count()
    }

    // ===== spectral =====
    {
      val es = emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val knn = time("spectral_knn") {
        graft.graphops.AllNeighbors.exact(es, 10, Metric.L2, "id", "vec")
          .select(col("src"), col("dst"))
      }
      val adj = time("spectral_collect") {
        knn.unionByName(knn.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      time("spectral_eigen") {
        val n = 400
        val ids = es.select(col("id").cast("long")).collect().map(_.getLong(0)).sorted
        val idx = ids.zipWithIndex.toMap
        val deg = new Array[Double](ids.length)
        adj.foreach { case (s, _) => deg(idx(s)) += 1.0 }
        val lap = Array.fill(ids.length, ids.length)(0.0)
        for (i <- ids.indices) lap(i)(i) = 1.0
        adj.foreach { case (s, d) =>
          val (i, j) = (idx(s), idx(d)); lap(i)(j) = -1.0 / math.sqrt(deg(i) * deg(j))
        }
        graft.core.Eigen.symEigen(lap)._1.length
      }
      time("spectral_fitPredict_full") {
        graft.graphops.Spectral.fitPredict(es, nClusters = 4,
          graft.graphops.Spectral.Params(nNeighbors = 10), "id", "vec").count()
      }
    }

    // ===== trustworthiness =====
    time("trustworthiness") {
      graft.StatsQueries.queries("trustworthiness")(spark, dir).count()
    }

    // ===== dedup =====
    time("dedup_minhash_lsh") {
      graft.TextQueries.queries("dedup_minhash_lsh")(spark, dir).count()
    }
    time("dedup_jaccard_pairs") {
      graft.TextQueries.queries("dedup_jaccard_pairs")(spark, dir).count()
    }
    spark.stop()
  }
}
