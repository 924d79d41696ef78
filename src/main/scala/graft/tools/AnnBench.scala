package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.sources.Hdf5

/** End-to-end run of the reference's own acceptance harness protocol
  * (cuvs_bench, fern/pages/cuvs_bench/running.md:87,117): a dataset in the
  * ann-benchmarks HDF5 layout (`train`/`test` float32 matrices,
  * `neighbors` int32 + `distances` float32 ground truth, a root `distance`
  * attribute), searched in BOTH of the protocol's modes
  * (ann_types.hpp:18) — `latency` (consecutive `--batch-size 10` batches,
  * each its own job, as the harness submits them) and `throughput` (the
  * whole test set as one batch, the engine's actual design target) — with
  * recall scored against the FILE's ground truth, not against a gt
  * recomputed by the engine under test. Results are additionally grouped
  * into the reference's recall buckets (comparing_indexes.md:29-40:
  * 80-89 / 90-94 / 95-98 / 99+ — "compare within a bucket, never
  * across"), best-QPS point per (algo, mode, bucket).
  *
  * This closes the loop from fixture gates to the protocol a cuvs user
  * actually accepts indexes with: the same [[Hdf5]] reader that ingests
  * real ann-benchmarks files (glove/sift/deep) drives the run; with zero
  * egress in this environment the files are exported from the sf fixture
  * in the exact layout — at its native 64-dim geometry AND a derived
  * 256-dim one (four permuted copies concatenated), so the harness is
  * demonstrably not tuned to a single width. Pointing `main` at a
  * downloaded glove-100-angular.hdf5 is a path change, not a code change.
  *
  * `runMain graft.tools.AnnBench [sfDir] [outJson]` writes ANN_BENCH.json
  * and prints one `ANNBENCH` JSON line per (dataset, algo, knob, mode).
  */
object AnnBench {

  /** Export an ann-benchmarks-layout HDF5 from a (vec_id, embedding)
    * frame: every 20th vector is a test query, the rest are train rows,
    * and the ground truth is the exact k-NN of each query over TRAIN
    * POSITIONS (the format indexes neighbors by row position, not by
    * source id). */
  def buildFileFrom(spark: SparkSession, emb: DataFrame, path: String, k: Int = 10): Unit = {
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

  /** Fixture export at the embeddings' native geometry. */
  def buildFile(spark: SparkSession, sfDir: String, path: String, k: Int = 10): Unit =
    buildFileFrom(spark, spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")), path, k)

  /** A second geometry from the same fixture: each row's 4·dim vector is
    * its own embedding concatenated with the embeddings of three rows
    * under deterministic affine permutations of the dense id space
    * (id -> (a·id + b) mod n, gcd(a, n) = 1). Unlike tiling one vector
    * (which preserves the neighbor structure exactly) the mixed copies
    * give a genuinely different high-dimensional neighborhood graph. */
  def widened(emb: DataFrame, copies: Int = 4): DataFrame = {
    val allPerms = Seq((7L, 3L), (11L, 5L), (13L, 7L))
    require(copies >= 2 && copies <= allPerms.length + 1,
      s"copies must be in [2, ${allPerms.length + 1}], got $copies")
    // the affine maps permute [0, n) — a gapped or offset id space would
    // make the inner joins silently DROP rows (shrinking the exported
    // ground truth with nothing failing), so density is a hard require
    val stats = emb.agg(count(lit(1)),
      min(col("vec_id").cast("long")), max(col("vec_id").cast("long"))).head()
    val n = stats.getLong(0)
    require(n > 0 && stats.getLong(1) == 0L && stats.getLong(2) == n - 1,
      s"widened() needs dense vec_ids 0..n-1; got n=$n, " +
        s"min=${stats.get(1)}, max=${stats.get(2)}")
    val perms = allPerms.take(copies - 1)
    require(perms.forall { case (a, _) => BigInt(a).gcd(BigInt(n)) == 1 },
      s"permutation multipliers must be coprime with n=$n")
    var out = emb.select(col("vec_id"), col("embedding").as("_e0"))
    perms.zipWithIndex.foreach { case ((a, b), j) =>
      val side = emb.select(col("vec_id").as(s"_jid$j"), col("embedding").as(s"_e${j + 1}"))
      out = out.join(broadcast(side),
        pmod(col("vec_id") * lit(a) + lit(b), lit(n)) === col(s"_jid$j"))
        .drop(s"_jid$j")
    }
    out.select(col("vec_id"),
      concat((0 until copies).map(j => col(s"_e$j")): _*).cast("array<float>")
        .as("embedding"))
  }

  case class Result(algo: String, knob: String, value: Int, mode: String,
      recall: Double, qps: Double, buildSec: Double)

  /** Best-QPS representative of a reference recall bucket. */
  case class Bucket(algo: String, mode: String, bucket: String,
      value: Int, recall: Double, qps: Double)

  /** recall@k with duplicate (qid, nbr_id) pairs counted ONCE — a route
    * that emitted duplicates must not have each copy count as a match. */
  def scoreRecall(pairs: Seq[(Long, Long)], gt: Map[Long, Set[Int]],
      denom: Long): Double =
    pairs.distinct.count { case (q, n) =>
      gt.get(q).exists(_.contains(n.toInt)) }.toDouble / denom

  /** Best-QPS point per (algo, mode, reference bucket) — the shared
    * [[RecallBuckets]] edges, the protocol's fair-comparison framing. */
  def toBuckets(points: Seq[Result]): Seq[Bucket] =
    RecallBuckets.best(points, (_: Result).recall, (r: Result) => (r.algo, r.mode))(
      _.maxBy(_.qps)).map { case ((algo, mode), label, b) =>
        Bucket(algo, mode, label, b.value, b.recall, b.qps)
      }

  /** Run the protocol over one exported file: every (algo, knob) point is
    * measured in both modes. One warm batch per (config, mode) pays
    * codegen/JIT so QPS measures steady state; the timed window covers
    * search + collect ONLY — ground-truth matching happens outside the
    * clock (the cuvs_bench harness does not charge scoring to the
    * engine). */
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
    val latencyBatches = (0L until nQ by batchSize).map { lo =>
      test.filter(col("qid") >= lo && col("qid") < lo + batchSize)
    }
    val modes = Seq("latency" -> latencyBatches, "throughput" -> Seq(test))

    def protocolRun(algo: String, knob: String, value: Int, buildSec: Double,
        mode: String, batches: Seq[DataFrame])(
        search: DataFrame => DataFrame): Result = {
      search(batches.head).select(col("qid"), col("nbr_id")).count() // warm
      val collected = scala.collection.mutable.ArrayBuffer.empty[Array[org.apache.spark.sql.Row]]
      val t0 = System.nanoTime()
      batches.foreach { b =>
        collected += search(b).select(col("qid"), col("nbr_id")).collect()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // scoring runs OUTSIDE the timed window, duplicates count once
      val recall = scoreRecall(
        collected.flatMap(_.iterator.map(r => (r.getLong(0), r.getLong(1)))).toSeq,
        gt, nQ * k)
      Result(algo, knob, value, mode, recall, nQ / wall, buildSec)
    }

    def bothModes(algo: String, knob: String, value: Int, buildSec: Double)(
        search: DataFrame => DataFrame): Seq[Result] =
      modes.map { case (mode, batches) =>
        protocolRun(algo, knob, value, buildSec, mode, batches)(search)
      }

    val out = scala.collection.mutable.ArrayBuffer.empty[Result]

    // exact brute force — the protocol's reference algo (cuvs_bench's
    // cuvs_brute_force): recall 1.0 by construction, so its QPS is the
    // exact baseline the bucketed rows compare against
    out ++= bothModes("brute_force", "k", k, 0.0)(b =>
      graft.ops.BruteForceKnn.knnJoin(train, b, k, Metric.L2Sqrt, "id", "vec"))

    // IVF-Flat at the driver build config, probe sweep
    val tIvf0 = System.nanoTime()
    val ivf = graft.index.IvfFlatIndex.build(train,
      graft.index.IvfFlatIndex.Params(nLists = 16, nIters = 10), "id", "vec")
    ivf.lists.count()
    val ivfBuild = (System.nanoTime() - tIvf0) / 1e9
    Seq(4, 8, 16).foreach { p =>
      out ++= bothModes("ivf_flat", "n_probes", p, ivfBuild)(b =>
        ivf.search(b, k, nProbes = p))
    }

    // IVF-PQ at the flagship refine discipline (kCoarse = n/3, the
    // reorder depth that recovers the >=95 bucket from the lossy codes).
    // pq_dim scales with the vector width (the reference's auto default
    // keeps sub-vectors a few dims wide — a fixed pqDim 8 over 256 dims
    // would be 32 floats per code and cap recall at ~0.9 even refined)
    // and must DIVIDE dim (IvfPqIndex's layout contract), so take the
    // largest divisor at or under the dim/8 target — glove-100 gets 10,
    // the 64/256-dim fixtures keep 8/32
    val tPq0 = System.nanoTime()
    val dim = train.select(col("vec")).head().getAs[scala.collection.Seq[Float]](0).length
    val pqDim = (math.max(8, dim / 8) to 1 by -1).find(dim % _ == 0).get
    val pq = graft.index.IvfPqIndex.build(train,
      graft.index.IvfPqIndex.Params(nLists = 16, nIters = 10,
        pqDim = pqDim, pqBits = 8),
      "id", "vec", base = Some(ivf))
    pq.lists.count()
    val pqBuild = ivfBuild + (System.nanoTime() - tPq0) / 1e9
    val nTrain = train.count()
    val kcPq = math.max(200L, nTrain / 3).toInt
    Seq(4, 8, 16).foreach { p =>
      out ++= bothModes("ivf_pq", "n_probes", p, pqBuild)(b =>
        pq.searchWithRefine(b, train, k, nProbes = p, kCoarse = kcPq,
          idCol = "id", vecCol = "vec"))
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
    Seq(20, 40, 100, 200).foreach { t =>
      out ++= bothModes("cagra", "itopk", t, cagBuild)(b =>
        graft.graphops.GraphSearch.search(cagra.select(col("src"), col("dst")),
          train, b, k,
          // round bound scales with the beam: the frontier-empty early
          // exit makes the headroom free once the beam drains
          graft.graphops.GraphSearch.Params(itopk = t, searchWidth = 8,
            maxIterations = math.max(30, t / 2)), "id", "vec"))
    }

    // Vamana (DiskANN) at the reference's 2:1 visited:degree shape over
    // the same 32-NN pool; search is the same greedy beam, knob = the
    // DiskANN search-list size L (itopk here)
    val tV0 = System.nanoTime()
    val vamana = graft.graphops.Vamana.build(train,
      graft.graphops.Vamana.Params(graphDegree = 16, visitedSize = 32), "id", "vec",
      candidates = Some(knn32.select(col("src"), col("dst"), col("dist"))))
      .localCheckpoint()
    vamana.count()
    val vamBuild = poolSec + (System.nanoTime() - tV0) / 1e9
    Seq(20, 40, 100, 200).foreach { t =>
      out ++= bothModes("vamana", "itopk", t, vamBuild)(b =>
        graft.graphops.GraphSearch.search(vamana.select(col("src"), col("dst")),
          train, b, k,
          graft.graphops.GraphSearch.Params(itopk = t, searchWidth = 8,
            maxIterations = math.max(30, t / 2)), "id", "vec"))
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
    // baseIterations auto (0): hnswlib canon — the beam's round bound
    // tracks ef on the in-memory routes instead of saturating at 10
    Seq(20, 40, 100, 200).foreach { ef =>
      out ++= bothModes("hnsw", "ef", ef, hBuild)(b =>
        graft.index.Hnsw.search(hnsw, train, b, k, ef = ef, "id", "vec"))
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
    val emb64 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_annbench").toString
    val datasets = Seq(
      ("fixture-64-euclidean", emb64),
      ("fixture-256-euclidean", widened(emb64).localCheckpoint()))

    def js(r: Result): String =
      f"""{"algo":"${r.algo}","knob":"${r.knob}","value":${r.value},""" +
        f""""mode":"${r.mode}","recall":${r.recall}%.4f,"qps":${r.qps}%.1f,""" +
        f""""build_sec":${r.buildSec}%.3f}"""
    def jb(b: Bucket): String =
      f"""{"algo":"${b.algo}","mode":"${b.mode}","bucket":"${b.bucket}",""" +
        f""""value":${b.value},"recall":${b.recall}%.4f,"qps":${b.qps}%.1f}"""

    val sections = datasets.map { case (name, emb) =>
      val h5 = s"$tmp/$name.hdf5"
      buildFileFrom(spark, emb, h5)
      val results = run(spark, h5)
      results.foreach(r => println(s"ANNBENCH $name ${js(r)}"))
      val buckets = toBuckets(results)
      s"""{"name":"$name","points":${results.map(js).mkString("[\n  ", ",\n  ", "\n]")},""" +
        s""""buckets":${buckets.map(jb).mkString("[\n  ", ",\n  ", "\n]")}}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (s"""{"protocol":{"k":10,"batch_size":10,"modes":["latency","throughput"],""" +
        s""""source":"$sfDir embeddings exported to ann-benchmarks hdf5 layout; """ +
        s"""256-dim = four permuted copies concatenated"},""" +
        s""""datasets":[${sections.mkString(",\n")}]}""").getBytes("UTF-8"))
    println(s"ANNBENCH written $outPath (${sections.length} datasets)")
    spark.stop()
  }
}
