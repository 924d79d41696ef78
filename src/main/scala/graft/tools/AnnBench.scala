package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.sources.Hdf5

/** End-to-end run of the reference's own acceptance harness protocol
  * (cuvs_bench, fern/pages/cuvs_bench/running.md:87,117): a dataset in the
  * ann-benchmarks HDF5 layout (`train`/`test` float32 matrices,
  * `neighbors` int32 + `distances` float32 ground truth, a root `distance`
  * attribute), searched at `--batch-size 10 -k 10`, scored as recall@k
  * against the FILE's ground truth — not against a gt recomputed by the
  * engine under test. This closes the loop from fixture gates to the
  * protocol a cuvs user actually accepts indexes with: the same [[Hdf5]]
  * reader that ingests real ann-benchmarks files (glove/sift/deep) drives
  * the run; with zero egress in this environment the file itself is
  * exported from the sf fixture in the exact layout, so pointing `main` at
  * a downloaded glove-100-angular.hdf5 is a path change, not a code
  * change.
  *
  * `runMain graft.tools.AnnBench [sfDir] [outJson]` writes ANN_BENCH.json
  * and prints one `ANNBENCH` JSON line per (algo, knob) point.
  */
object AnnBench {

  /** Export an ann-benchmarks-layout HDF5 from the fixture embeddings:
    * every 20th vector is a test query, the rest are train rows, and the
    * ground truth is the exact k-NN of each query over TRAIN POSITIONS
    * (the format indexes neighbors by row position, not by source id). */
  def buildFile(spark: SparkSession, sfDir: String, path: String, k: Int = 10): Unit = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val test = emb.filter(col("vec_id") % 20 === 0)
    val trainRaw = emb.filter(col("vec_id") % 20 =!= 0)
    // the format's position contract (row index into one contiguous
    // matrix) comes from a distributed sort + zipWithIndex — an
    // unpartitioned row_number window would drag the whole train side
    // through one task, the slowest step of a real (millions-of-rows)
    // ann-benchmarks export
    val train = {
      import spark.implicits._
      trainRaw.orderBy(col("vec_id")).select(col("embedding")).as[Array[Float]]
        .rdd.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("pos", "embedding")
        .localCheckpoint()
    }
    val q = test.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val gt = graft.ops.BruteForceKnn.knnJoin(
        train.select(col("pos").as("id"), col("embedding").as("vec")), q, k,
        Metric.L2Sqrt, "id", "vec")
      .groupBy(col("qid"))
      .agg(
        transform(array_sort(collect_list(struct(col("rank"), col("nbr_id")))),
          s => s.getField("nbr_id").cast("int")).as("ids"),
        transform(array_sort(collect_list(struct(col("rank"), col("dist")))),
          s => s.getField("dist").cast("float")).as("dists"))
      .localCheckpoint()
    // test/neighbors/distances share row order: ascending qid = positions
    Hdf5.write(spark, path, Seq(
      Hdf5.Spec("train", train, "pos", "embedding"),
      Hdf5.Spec("test", q.select(col("qid"), col("qvec")), "qid", "qvec"),
      Hdf5.Spec("neighbors", gt.select(col("qid"), col("ids")), "qid", "ids", Hdf5.I32),
      Hdf5.Spec("distances", gt.select(col("qid"), col("dists")), "qid", "dists")),
      attrs = Map("distance" -> "euclidean"))
  }

  case class Result(algo: String, knob: String, value: Int,
      recall: Double, qps: Double, buildSec: Double)

  /** The canonical protocol: search the `test` set in consecutive
    * `batchSize`-query batches (each batch its own job, as the harness
    * submits them), k results per query, recall scored against the file's
    * `neighbors` rows. One warm batch per config pays codegen/JIT so QPS
    * measures steady state. */
  def run(spark: SparkSession, path: String, k: Int = 10,
      batchSize: Int = 10): Seq[Result] = {
    val train = Hdf5.read(spark, path, "train").localCheckpoint()  // (id, vec)
    val test = Hdf5.read(spark, path, "test")
      .select(col("id").as("qid"), col("vec").as("qvec")).localCheckpoint()
    val nQ = test.count()
    require(nQ > 0, s"$path: empty 'test' dataset — nothing to search")
    // ground truth: position-indexed rows, tiny (q x k ints) — driver map
    val gt: Map[Long, Set[Int]] = Hdf5.read(spark, path, "neighbors")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Int](1).take(k).toSet).toMap
    require(gt.size == nQ,
      s"$path: 'neighbors' has ${gt.size} rows but 'test' has $nQ — inconsistent ground truth")
    require(gt.values.forall(_.size == k),
      s"$path: 'neighbors' rows narrower than k=$k")

    // lazy filters over the one checkpointed test frame — a checkpoint
    // per batch would pay nQ/batchSize jobs and pin as many cached RDDs
    // before any measurement (10k-query real files → ~1000 of each)
    val batches = (0L until nQ by batchSize).map { lo =>
      test.filter(col("qid") >= lo && col("qid") < lo + batchSize)
    }

    def protocolRun(algo: String, knob: String, value: Int, buildSec: Double)(
        search: DataFrame => DataFrame): Result = {
      search(batches.head).select(col("qid"), col("nbr_id")).count() // warm
      var matched = 0L
      val t0 = System.nanoTime()
      batches.foreach { b =>
        val got = search(b).select(col("qid"), col("nbr_id")).collect()
        matched += got.count(r => gt(r.getLong(0)).contains(r.getLong(1).toInt))
      }
      val wall = (System.nanoTime() - t0) / 1e9
      Result(algo, knob, value, matched.toDouble / (nQ * k), nQ / wall, buildSec)
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[Result]

    // IVF-Flat at the driver build config, probe sweep
    val tIvf0 = System.nanoTime()
    val ivf = graft.index.IvfFlatIndex.build(train,
      graft.index.IvfFlatIndex.Params(nLists = 16, nIters = 10), "id", "vec")
    ivf.lists.count()
    val ivfBuild = (System.nanoTime() - tIvf0) / 1e9
    Seq(4, 8, 16).foreach { p =>
      out += protocolRun("ivf_flat", "n_probes", p, ivfBuild)(b =>
        ivf.search(b, k, nProbes = p))
    }

    // graph family over one 32-NN pool (reference-shaped 2:1 discipline)
    val tPool0 = System.nanoTime()
    val knn32 = graft.graphops.AllNeighbors.exact(train, 32, Metric.L2Sqrt, "id", "vec")
      .localCheckpoint()
    knn32.count()
    val poolSec = (System.nanoTime() - tPool0) / 1e9

    val tCag0 = System.nanoTime()
    // guarantee_connectivity (cagra.hpp): held-out queries land anywhere,
    // so an island in the pruned graph is unreachable recall — bridge it
    val cagra = graft.graphops.CagraOptimize.optimizeConnected(
      knn32.select(col("src"), col("dst"), col("dist")), degree = 16).localCheckpoint()
    cagra.count()
    val cagBuild = poolSec + (System.nanoTime() - tCag0) / 1e9
    // held-out queries (unlike the in-dataset RecallSweep workload) need
    // the wider beam end of the knob to converge — that IS the protocol's
    // point: the recall-vs-QPS tradeoff under a forced train/test split
    Seq(20, 40, 100).foreach { t =>
      out += protocolRun("cagra", "itopk", t, cagBuild)(b =>
        graft.graphops.GraphSearch.search(cagra.select(col("src"), col("dst")),
          train, b, k,
          graft.graphops.GraphSearch.Params(itopk = t, searchWidth = 8,
            maxIterations = 30), "id", "vec"))
    }

    val tH0 = System.nanoTime()
    // the reference's HNSW IS a converted CAGRA graph (hnsw.hpp:43-65);
    // hnswlib's links are bidirectional, so symmetrize — a raw directed
    // kNN base leaves islands a single-entry descent can't reach
    // (measured: 0.92 ceiling on held-out queries at any ef)
    val symBase = cagra.select(col("src"), col("dst"), col("dist"))
      .unionByName(cagra.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
      .distinct()
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
          .orderBy(col("dist"), col("dst"))))
    val hnsw = graft.index.Hnsw.fromGraph(symBase, train,
      graft.index.Hnsw.Params(m = 16), "id", "vec")
    val hBuild = cagBuild + (System.nanoTime() - tH0) / 1e9
    // hnswlib canon expands until the ef queue exhausts; the protocol run
    // tracks that by scaling the beam's round bound with ef (the default
    // 10-round cap is a distributed-job-count bound — under it the ef knob
    // saturates at ~0.92 recall on held-out queries)
    Seq(20, 40, 100).foreach { ef =>
      out += protocolRun("hnsw", "ef", ef, hBuild)(b =>
        graft.index.Hnsw.search(hnsw, train, b, k, ef = ef, "id", "vec",
          baseIterations = math.max(10, ef)))
    }

    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("/root/repo/ANN_BENCH.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val h5 = java.nio.file.Files.createTempDirectory("graft_annbench").toString +
      "/fixture-64-euclidean.hdf5"
    buildFile(spark, sfDir, h5)
    val results = run(spark, h5)
    def js(r: Result): String =
      f"""{"algo":"${r.algo}","knob":"${r.knob}","value":${r.value},""" +
        f""""recall":${r.recall}%.4f,"qps":${r.qps}%.1f,"build_sec":${r.buildSec}%.3f}"""
    results.foreach(r => println(s"ANNBENCH ${js(r)}"))
    val body = results.map(js).mkString("[\n  ", ",\n  ", "\n]")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (s"""{"protocol":{"k":10,"batch_size":10,"source":"$sfDir embeddings """ +
        s"""exported to ann-benchmarks hdf5 layout"},"points":$body}""").getBytes("UTF-8"))
    println(s"ANNBENCH written $outPath (${results.length} points)")
    spark.stop()
  }
}
