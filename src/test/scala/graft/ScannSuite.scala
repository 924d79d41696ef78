package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.index.{IvfFlatIndex, ScannIndex}
import graft.ops.BruteForceKnn

/** ScaNN index: SOAR spilling + residual PQ + reordering (scann.hpp:40-76).
  * Discipline: spill doubles storage, recall under partial probing beats
  * the unspilled IVF layout; full probes + reorder is exact-capable. */
class ScannSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def recall(got: DataFrame): Double = {
    val exact = BruteForceKnn.knnJoin(emb, queries, 10, Metric.L2, "vec_id", "embedding")
      .select(col("qid"), col("nbr_id"))
    got.select(col("qid"), col("nbr_id")).intersect(exact).count().toDouble / exact.count()
  }

  test("every vector is stored twice (primary + SOAR spill)") {
    val idx = ScannIndex.build(emb,
      ScannIndex.Params(nLeaves = 8, nIters = 10), "vec_id", "embedding")
    val n = emb.count()
    assert(idx.lists.count() == 2 * n)
    // each id appears in exactly two distinct leaves
    val per = idx.lists.groupBy(col("id"))
      .agg(countDistinct(col("list_id")).as("leaves"))
    assert(per.filter(col("leaves") =!= 2).count() == 0)
  }

  test("SOAR spilling beats the unspilled IVF layout under partial probing") {
    val scann = ScannIndex.build(emb,
      ScannIndex.Params(nLeaves = 16, nIters = 10, pqBits = 8), "vec_id", "embedding")
    val ivf = IvfFlatIndex.build(emb,
      IvfFlatIndex.Params(nLists = 16, nIters = 10), "vec_id", "embedding")
    val rScann = recall(scann.searchWithRefine(queries, emb, 10, nProbes = 4,
      kCoarse = 40, "vec_id", "embedding"))
    val rIvf = recall(ivf.search(queries, 10, nProbes = 4))
    assert(rScann >= rIvf, s"scann $rScann < ivf $rIvf at 4/16 probes")
  }

  test("full probes + reorder at generous kCoarse is exact on the fixture") {
    val idx = ScannIndex.build(emb,
      ScannIndex.Params(nLeaves = 16, nIters = 10, pqBits = 8), "vec_id", "embedding")
    val got = idx.searchWithRefine(queries, emb, 10, nProbes = 16, kCoarse = 100,
      "vec_id", "embedding")
    assert(recall(got) == 1.0)
  }

  test("InnerProduct build: full probes + reorder is exact under the IP ordering") {
    // ScaNN's native regime (anisotropic quantization targets MIPS): cells
    // assigned by max dot, IP-LUT ADC candidates (larger-is-closer, SOAR
    // pair keeps the larger estimate), exact IP refine
    val idx = ScannIndex.build(emb,
      ScannIndex.Params(nLeaves = 16, nIters = 10, pqBits = 8,
        metric = Metric.InnerProduct), "vec_id", "embedding")
    assert(idx.metric == Metric.InnerProduct)
    val got = idx.searchWithRefine(queries, emb, 10, nProbes = 16, kCoarse = 100,
      "vec_id", "embedding")
    val exact = BruteForceKnn.knnJoin(emb, queries, 10, Metric.InnerProduct,
      "vec_id", "embedding").select(col("qid"), col("nbr_id"))
    val matched = got.select(col("qid"), col("nbr_id")).intersect(exact).count()
    assert(matched == exact.count(), s"IP recall ${matched.toDouble / exact.count()}")
    // metric + depth hint survive the save/load roundtrip
    val dir = java.nio.file.Files.createTempDirectory("scann_ip").toString
    idx.save(dir)
    val loaded = ScannIndex.load(spark, dir)
    assert(loaded.metric == Metric.InnerProduct)
    assert(loaded.depthHint == idx.depthHint && idx.depthHint.isDefined)
  }

  test("Cosine build: full probes + reorder is exact under the cosine ordering") {
    // cosine = IP over unit vectors: the build normalizes the dataset,
    // the search normalizes the query, and the shared max-close IP-LUT
    // estimator ranks by cosine similarity; refine re-ranks by true
    // cosine distance against the RAW vectors
    val idx = ScannIndex.build(emb,
      ScannIndex.Params(nLeaves = 16, nIters = 10, pqBits = 8,
        metric = Metric.Cosine), "vec_id", "embedding")
    assert(idx.metric == Metric.Cosine)
    val got = idx.searchWithRefine(queries, emb, 10, nProbes = 16, kCoarse = 100,
      "vec_id", "embedding")
    val exact = BruteForceKnn.knnJoin(emb, queries, 10, Metric.Cosine,
      "vec_id", "embedding").select(col("qid"), col("nbr_id"))
    val matched = got.select(col("qid"), col("nbr_id")).intersect(exact).count()
    assert(matched == exact.count(), s"cosine recall ${matched.toDouble / exact.count()}")
    // metric + depth hint survive the save/load roundtrip
    val dir = java.nio.file.Files.createTempDirectory("scann_cos").toString
    idx.save(dir)
    val loaded = ScannIndex.load(spark, dir)
    assert(loaded.metric == Metric.Cosine)
    assert(loaded.depthHint == idx.depthHint && idx.depthHint.isDefined)
  }

  test("save/load roundtrip searches identically (scann + ivf_sq)") {
    val idx = ScannIndex.build(emb,
      ScannIndex.Params(nLeaves = 8, nIters = 5, pqBits = 4), "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("scann").toString
    idx.save(dir)
    val loaded = ScannIndex.load(spark, dir)
    def key(df: DataFrame) = df.select("qid", "nbr_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(key(loaded.search(queries, 5, 4)) == key(idx.search(queries, 5, 4)))

    val sq = graft.index.IvfSqIndex.build(emb,
      IvfFlatIndex.Params(nLists = 8, nIters = 5), idCol = "vec_id", vecCol = "embedding")
    val dir2 = java.nio.file.Files.createTempDirectory("ivfsq").toString
    sq.save(dir2)
    val sqLoaded = graft.index.IvfSqIndex.load(spark, dir2)
    assert(key(sqLoaded.search(queries, 5, 4)) == key(sq.search(queries, 5, 4)))
  }
}
