package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.index.IvfFlatIndex
import graft.ops.BruteForceKnn

/** IVF-Flat: recall-threshold discipline of the reference
  * (ann_ivf_flat.cuh:102 — min_recall scales with n_probes/n_lists;
  * probing ALL lists must be exact). */
class IvfFlatSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def recallVsExact(got: DataFrame, k: Int): Double = {
    val exact = BruteForceKnn.knnJoin(emb, queries, k, Metric.L2, "vec_id", "embedding")
      .select(col("qid"), col("nbr_id"))
    val hits = got.select(col("qid"), col("nbr_id")).intersect(exact).count()
    hits.toDouble / exact.count()
  }

  private lazy val index = IvfFlatIndex.build(emb,
    IvfFlatIndex.Params(nLists = 16, nIters = 10), "vec_id", "embedding")

  test("balanced build: size floor holds and full-probe search stays exact") {
    val bal = IvfFlatIndex.build(emb,
      IvfFlatIndex.Params(nLists = 16, nIters = 10, trainFraction = 1.0,
        balanced = true),
      "vec_id", "embedding")
    val sizes = bal.lists.groupBy("list_id").count().select("count")
      .collect().map(_.getLong(0))
    val n = sizes.sum
    // fitBalanced enforces a balanceRatio * n/k floor (default 0.25)
    assert(sizes.min >= (0.25 * n / 16).toLong,
      s"min list ${sizes.min} below floor of ${(0.25 * n / 16).toLong}")
    val got = bal.search(queries, 10, nProbes = 16)
    assert(recallVsExact(got, 10) == 1.0)
  }

  test("probing all lists is exact (recall == 1)") {
    val got = index.search(queries, 10, nProbes = 16)
    assert(recallVsExact(got, 10) == 1.0)
  }

  test("n_probes=4/16 meets the recall floor") {
    val got = index.search(queries, 10, nProbes = 4)
    val r = recallVsExact(got, 10)
    assert(r >= 0.6, s"recall $r")
    assert(got.count() == queries.count() * 10)
  }

  test("extend: appended vectors are findable") {
    val shifted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val ext = index.extend(shifted, "vec_id", "embedding")
    // a duplicate vector sits at distance 0, so probing its own cell finds it
    val got = ext.search(queries, 3, nProbes = 4)
    assert(ext.lists.count() == emb.count() + 10)
    assert(got.count() == queries.count() * 3)
    val dupHits = got.filter(col("nbr_id") >= 10000).count()
    assert(dupHits > 0)
  }

  test("extendAdaptive: centers drift to the mean of their extended lists") {
    val shifted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.5f)).as("embedding"))
    val ext = index.extendAdaptive(shifted, "vec_id", "embedding")
    assert(ext.lists.count() == emb.count() + 10)
    // lists that received rows drift to the exact mean of their vectors;
    // untouched lists keep their trained center bit-for-bit
    val touched = ext.lists.filter(col("id") >= 10000)
      .select(col("list_id")).distinct().collect().map(_.getInt(0)).toSet
    assert(touched.nonEmpty)
    val means = ext.lists.groupBy(col("list_id"))
      .agg(graft.core.VectorAgg.vectorAvg(col("vec")).as("mean"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    means.foreach { case (l, m) =>
      val c = ext.centroids.centroid(l)
      if (touched(l))
        assert(graft.core.Distance.l2Sqrt(c, m) < 1e-5, s"list $l center drifted wrong")
      else
        assert(c.sameElements(index.centroids.centroid(l)), s"untouched list $l moved")
    }
    // membership was not re-assigned: same (id -> list) pairs for old rows
    val before = index.lists.select(col("id"), col("list_id"))
    val after = ext.lists.filter(col("id") < 10000).select(col("id"), col("list_id"))
    assert(before.except(after).count() == 0)
  }

  test("save/load roundtrip searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    index.save(dir)
    val loaded = IvfFlatIndex.load(spark, dir)
    def key(df: DataFrame) = df.select("qid", "nbr_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(key(loaded.search(queries, 5, 4)) == key(index.search(queries, 5, 4)))
  }
}
