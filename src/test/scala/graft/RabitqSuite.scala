package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.index.IvfRabitqIndex
import graft.ops.BruteForceKnn

/** IVF-RaBitQ: reference discipline (ivf_rabitq.hpp:48-53 — more
  * bits_per_dim -> better recall; refine recovers the estimator loss). */
class RabitqSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def recallVsExact(got: DataFrame, k: Int): Double = {
    val exact = BruteForceKnn.knnJoin(emb, queries, k, Metric.L2, "vec_id", "embedding")
      .select(col("qid"), col("nbr_id"))
    got.select(col("qid"), col("nbr_id")).intersect(exact).count().toDouble / exact.count()
  }

  test("rotation is orthogonal (norms preserved)") {
    val p = IvfRabitqIndex.randomRotation(16, seed = 42)
    for (i <- 0 until 16) {
      val ri = p.flat.slice(i * 16, i * 16 + 16)
      assert(math.abs(ri.map(x => x * x).sum - 1.0) < 1e-9)
      for (j <- 0 until i) {
        val rj = p.flat.slice(j * 16, j * 16 + 16)
        assert(math.abs(ri.zip(rj).map { case (a, b) => a * b }.sum) < 1e-9)
      }
    }
  }

  test("1-bit estimate + refine meets a high recall floor") {
    val idx = IvfRabitqIndex.build(emb,
      IvfRabitqIndex.Params(nLists = 8, nIters = 10, bitsPerDim = 1), "vec_id", "embedding")
    // 1-bit estimator variance needs a generous coarse list (kCoarse=100
    // of 500) before refine recovers the true top-10 on overlapping blobs.
    val got = idx.searchWithRefine(queries, emb, 10, nProbes = 8, kCoarse = 100,
      idCol = "vec_id", vecCol = "embedding")
    val r = recallVsExact(got, 10)
    assert(r >= 0.95, s"recall $r")
    assert(got.count() == queries.count() * 10)
  }

  test("bits=3 at full probes + refine is exact on the fixture") {
    val idx = IvfRabitqIndex.build(emb,
      IvfRabitqIndex.Params(nLists = 8, nIters = 10, bitsPerDim = 3), "vec_id", "embedding")
    val got = idx.searchWithRefine(queries, emb, 10, nProbes = 8, kCoarse = 40,
      idCol = "vec_id", vecCol = "embedding")
    assert(recallVsExact(got, 10) == 1.0)
  }

  test("save/load roundtrip searches identically") {
    val idx = IvfRabitqIndex.build(emb,
      IvfRabitqIndex.Params(nLists = 8, nIters = 5, bitsPerDim = 3), "vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("rabitq").toString
    idx.save(path)
    val loaded = IvfRabitqIndex.load(spark, path)
    val a = idx.search(queries, 10, nProbes = 8).collect().toSet
    val b = loaded.search(queries, 10, nProbes = 8).collect().toSet
    assert(a == b)
  }

  test("more bits per dim -> estimator-only recall does not degrade") {
    def estimatorRecall(bits: Int): Double = {
      val idx = IvfRabitqIndex.build(emb,
        IvfRabitqIndex.Params(nLists = 8, nIters = 10, bitsPerDim = bits), "vec_id", "embedding")
      recallVsExact(idx.search(queries, 10, nProbes = 8), 10)
    }
    val r1 = estimatorRecall(1)
    val r4 = estimatorRecall(4)
    assert(r4 >= r1 - 0.02, s"bits=4 recall $r4 < bits=1 recall $r1")
    assert(r4 >= 0.7, s"bits=4 estimator recall $r4")
  }
}
