package graft

import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.index.IvfPqIndex
import graft.ops.BruteForceKnn

class IvfPqSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private lazy val index = IvfPqIndex.build(emb,
    IvfPqIndex.Params(nLists = 8, nIters = 5, pqDim = 16, pqBits = 5), "vec_id", "embedding")

  private def recall(got: org.apache.spark.sql.DataFrame, k: Int): Double = {
    val exact = BruteForceKnn.knnJoin(emb, queries, k, Metric.L2, "vec_id", "embedding")
      .select(col("qid"), col("nbr_id"))
    got.select(col("qid"), col("nbr_id")).intersect(exact).count().toDouble / exact.count()
  }

  test("ADC search with all probes meets a PQ-limited recall floor") {
    val got = index.search(queries, 10, nProbes = 8)
    val r = recall(got, 10)
    assert(r >= 0.5, s"recall $r") // PQ approximation only; no cell loss
  }

  test("refine recovers recall (>= 0.9 with all probes, 4x coarse)") {
    val got = index.searchWithRefine(queries, emb, 10, nProbes = 8, kCoarse = 60,
      idCol = "vec_id", vecCol = "embedding")
    val r = recall(got, 10)
    assert(r >= 0.9, s"refined recall $r")
  }

  test("save/load roundtrip searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    index.save(dir)
    val loaded = IvfPqIndex.load(spark, dir)
    def key(df: org.apache.spark.sql.DataFrame) = df.select("qid", "nbr_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(key(loaded.search(queries, 5, 4)) == key(index.search(queries, 5, 4)))
  }

  test("refined distances are exact for the self match") {
    val got = index.searchWithRefine(queries, emb, 3, nProbes = 8, kCoarse = 20,
      idCol = "vec_id", vecCol = "embedding")
    val self = got.filter(col("qid") === col("nbr_id"))
    assert(self.count() > 0)
    assert(self.filter(col("dist") =!= 0.0).count() == 0)
  }
}
