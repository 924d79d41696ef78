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
    assert(byAlgo.keySet == Set("ivf_flat", "cagra", "hnsw"))
    // exhaustive IVF (16 of 16 probes) must reproduce the file's own gt
    val ivfFull = results.find(r => r.algo == "ivf_flat" && r.value == 16).get
    assert(ivfFull.recall >= 0.999, s"exhaustive probes recall ${ivfFull.recall}")
    // reference-shaped graph builds clear the reference floors at the
    // protocol's k=10/batch=10
    assert(byAlgo("cagra").map(_.recall).max >= 0.95)
    assert(byAlgo("hnsw").map(_.recall).max >= 0.95)
    results.foreach(r => assert(r.qps > 0 && r.recall >= 0 && r.recall <= 1.0))
  }
}
