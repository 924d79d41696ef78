package graft

import org.apache.spark.sql.functions._
import graft.tools.AnnBench
import graft.sources.Hdf5

/** The ann-benchmarks protocol harness must roundtrip its HDF5 layout
  * (train/test/neighbors/distances + distance attr), score recall against
  * the FILE's ground truth, and reach the exhaustive end exactly. */
class AnnBenchSuite extends SparkFunSuite {

  test("fixture export + batch-10 protocol run: layout, floors, exhaustive end") {
    val h5 = java.nio.file.Files.createTempDirectory("graft_annbench_suite").toString +
      "/fixture.hdf5"
    AnnBench.buildFile(spark, SparkTestBase.sf0001, h5)

    val info = Hdf5.info(spark, h5)
    assert(Set("train", "test", "neighbors", "distances").subsetOf(info.datasets.keySet))
    assert(info.attrs.get("distance").contains("euclidean"))
    val nTest = info.datasets("test").nRows
    assert(info.datasets("neighbors").nRows == nTest)
    assert(info.datasets("neighbors").rowElems == 10)
    assert(info.datasets("train").nRows + nTest ==
      spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet").count())
    // ground-truth ids are train POSITIONS: all within [0, nTrain)
    val nTrain = info.datasets("train").nRows
    val ids = Hdf5.read(spark, h5, "neighbors").select(explode(col("ids")).as("i"))
    assert(ids.filter(col("i") < 0 || col("i") >= nTrain).isEmpty)

    val results = AnnBench.run(spark, h5)
    assert(results.nonEmpty)
    val byAlgo = results.groupBy(_.algo)
    assert(byAlgo.keySet ==
      Set("brute_force", "ivf_flat", "ivf_pq", "cagra", "vamana", "hnsw"))
    // the exact-baseline algo IS exact: recall 1.0 in both modes
    assert(byAlgo("brute_force").forall(_.recall == 1.0),
      s"brute_force recall ${byAlgo("brute_force").map(_.recall)}")
    // PQ at the flagship refine depth recovers the high bucket at full probes
    assert(byAlgo("ivf_pq").filter(_.value == 16).forall(_.recall >= 0.95),
      s"ivf_pq@16 recall ${byAlgo("ivf_pq").filter(_.value == 16).map(_.recall)}")
    // BOTH protocol modes measured for every (algo, knob) point
    assert(results.groupBy(r => (r.algo, r.knob, r.value))
      .forall(_._2.map(_.mode).toSet == Set("latency", "throughput")),
      "every point must carry a latency AND a throughput measurement")
    // exhaustive IVF (16 of 16 probes) must reproduce the file's own gt
    val ivfFull = results.filter(r => r.algo == "ivf_flat" && r.value == 16)
    assert(ivfFull.nonEmpty && ivfFull.forall(_.recall >= 0.999),
      s"exhaustive probes recall ${ivfFull.map(_.recall)}")
    // reference-shaped graph builds clear the reference floors at the
    // protocol's k=10/batch=10
    assert(byAlgo("cagra").map(_.recall).max >= 0.95)
    assert(byAlgo("hnsw").map(_.recall).max >= 0.95)
    results.foreach(r => assert(r.qps > 0 && r.recall >= 0 && r.recall <= 1.0))

    // bucket report: every row sits inside its declared bucket, is the
    // best QPS of its (algo, mode) group within that bucket, and the
    // exhaustive configs land a 99+ row
    val buckets = AnnBench.toBuckets(results)
    val edges = Map("80-89" -> (0.80, 0.90), "90-94" -> (0.90, 0.95),
      "95-98" -> (0.95, 0.99), "99+" -> (0.99, 1.01))
    buckets.foreach { b =>
      val (lo, hi) = edges(b.bucket)
      assert(b.recall >= lo && b.recall < hi, s"$b outside its bucket")
      val peers = results.filter(r => r.algo == b.algo && r.mode == b.mode &&
        r.recall >= lo && r.recall < hi)
      assert(b.qps == peers.map(_.qps).max, s"$b is not its bucket's best QPS")
    }
    assert(buckets.exists(b => b.bucket == "99+" && b.algo == "ivf_flat"),
      "exhaustive IVF must populate the 99+ bucket")
  }

  test("scoreRecall counts duplicate (qid, nbr_id) pairs once") {
    val gt = Map(1L -> Set(10, 11), 2L -> Set(20, 21))
    // q1 returns 10 three times + a miss; q2 returns both true neighbors
    val pairs = Seq((1L, 10L), (1L, 10L), (1L, 10L), (1L, 99L), (2L, 20L), (2L, 21L))
    assert(AnnBench.scoreRecall(pairs, gt, denom = 4) == 0.75,
      "triplicate match must count once: 3 distinct matches / 4")
  }

  test("widened fixture: 4x dim, same rows, a genuinely different neighborhood") {
    val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val wide = AnnBench.widened(emb)
    assert(wide.count() == emb.count())
    val dims = wide.select(size(col("embedding")).as("d")).distinct().collect()
    val dim0 = emb.select(size(col("embedding"))).head().getInt(0)
    assert(dims.length == 1 && dims.head.getInt(0) == 4 * dim0)
    // deterministic: two evaluations agree bit for bit
    assert(wide.exceptAll(AnnBench.widened(emb)).isEmpty)
    // the mixed copies change the neighbor structure (tiling would not):
    // top-10 of a probe query differs between the two geometries
    val q64 = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val q256 = wide.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def top(d: org.apache.spark.sql.DataFrame, q: org.apache.spark.sql.DataFrame) =
      graft.ops.BruteForceKnn.knnJoin(d, q, 10, graft.core.Metric.L2Sqrt,
        "vec_id", "embedding").select("nbr_id").collect().map(_.getLong(0)).toSet
    assert(top(emb, q64) != top(wide, q256),
      "widened geometry must not preserve the 64-dim neighbor set verbatim")
  }
}
