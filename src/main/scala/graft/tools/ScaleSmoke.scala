package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric

/** Scale smoke test: drive the DISTRIBUTED routes (LocalKernel off) on
  * synthetic data ~100x the sf0.1 fixture, proving the at-scale plans
  * execute without driver collects, broadcast overflows, or OOM — the
  * local stand-in for the 1000-executor / 100 TB posture question.
  * Vectors are hash-derived (deterministic, no RNG state), generated
  * distributed via spark.range — the driver never holds the dataset.
  *
  * Run: SPARK_GRAFT_SCALE_N=200000 sbt "runMain graft.tools.ScaleSmoke"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "200000").toLong
    val dim = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIM", "64").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.driver.maxResultSize", "2g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the whole point: every operator below must survive on its
    // distributed plan alone
    spark.conf.set("spark.graft.localKernel.enabled", "false")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // surface the stages that matter: anything over 5s prints, so a
    // straggler stage is attributable without the (disabled) UI
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val secs = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (secs > 5.0)
          println(f"  STAGE ${si.stageId}%5d ${si.name.take(56)}%-56s tasks=${si.numTasks}%5d $secs%7.2f s")
      }
    })

    // deterministic blobs: 32 centers on hash rays, points = center + hash noise
    val data = spark.range(0, n, 1, 64)
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (pmod(xxhash64(col("id") % 32, j), lit(1000)).cast("double") / 100.0 +
            pmod(xxhash64(col("id"), j), lit(97)).cast("double") / 97.0)
            .cast("float")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("generate+materialize")(data.count())

    val q = data.filter(col("id") % math.max(1L, n / 200) === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))

    time("bruteforce_knn_200q") {
      graft.ops.BruteForceKnn.knnJoin(data, q, 10, Metric.L2, "id", "vec").count()
    }

    val km = time("kmeans_distributed_fit") {
      graft.cluster.KMeans.fit(data,
        graft.cluster.KMeans.Params(k = 64, maxIter = 5), "id", "vec")
    }
    println(f"SCALE   kmeans inertia ${km.inertia}%.3e iters ${km.iterations}")

    time("silhouette_sampled_200k") {
      // past the 20k exact gate the sampled route engages (r3 verdict's
      // O(n^2) flag): every point scored against per-cluster samples,
      // O(n * clusters * cap) with a broadcast sample side
      spark.conf.set("spark.graft.silhouette.samplePerCluster", "64")
      val (cl, _) = graft.cluster.KMeans.assignCols(km.centroids, col("vec"))
      graft.stats.Silhouette.perPoint(
        data.select(col("id"), col("vec"), cl.as("label")), Metric.L2).count()
    }

    val ivf = time("ivf_flat_build_128lists_balanced") {
      graft.index.IvfFlatIndex.build(data,
        graft.index.IvfFlatIndex.Params(nLists = 128, nIters = 5,
          balanced = true), "id", "vec")
    }
    time("ivf_flat_search_8probes") {
      ivf.search(q, 10, nProbes = 8).count()
    }

    val g10 = time("all_neighbors_64cells") {
      graft.graphops.AllNeighbors.build(data,
        graft.graphops.AllNeighbors.Params(k = 10, nClusters = 64,
          overlapFactor = 2, kmeansIters = 5), "id", "vec")
    }
    val opt = time("cagra_optimize_200k") {
      graft.graphops.CagraOptimize.optimize(
        g10.select(col("src"), col("dst"), col("dist")), degree = 8).localCheckpoint()
    }
    time("cagra_beam_search_200q") {
      graft.graphops.GraphSearch.search(opt.select(col("src"), col("dst")),
        data, q, 10,
        graft.graphops.GraphSearch.Params(itopk = 40, searchWidth = 4,
          maxIterations = 8), "id", "vec").count()
    }

    time("nn_descent_50k_sampled") {
      // quarter-scale DENSE prefix (the seeded init assumes ~dense ids);
      // maxSamples=8 < 2k keeps the GNND sampling cap ACTIVE
      graft.graphops.NnDescent.build(
        data.filter(col("id") < n / 4),
        graft.graphops.NnDescent.Params(k = 8, maxIterations = 3,
          terminationThreshold = 0, maxSamples = 8), "id", "vec").count()
    }

    val edges = time("components_edges") {
      ivf.search(q, 5, nProbes = 4)
        .select(col("qid").as("src"), col("nbr_id").as("dst")).localCheckpoint()
    }
    time("connected_components_distributed") {
      graft.graphops.Components.connectedComponents(
        data.select(col("id")), edges, "id").count()
    }

    // release the vector phase's cached state before the text phase — the
    // hygiene a long-lived 100 TB pipeline needs anyway, and it keeps the
    // text-phase timings honest (accumulated caches/shuffles were
    // inflating them ~10x in earlier runs)
    data.unpersist()
    ivf.lists.unpersist()

    // near-dup text corpus: 10% of docs are near-copies of a base doc
    val docs = spark.range(0, n / 4, 1, 64)
      .select(col("id"),
        concat_ws(" ", (0 until 24).map(j =>
          when(col("id") % 10 === 0 && j >= 22, lit("copysuffix"))
            .otherwise(pmod(xxhash64(when(col("id") % 10 === 0, col("id") - 1)
              .otherwise(col("id")), lit(j)), lit(5000)).cast("string"))): _*).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docs_materialize")(docs.count())
    time("minhash_lsh_dedup") {
      graft.text.Dedup.minhashLshPairs(docs, "id", "text").count()
    }

    println("SCALE done — all distributed routes executed")
    spark.stop()
  }
}
