package graft

import org.apache.spark.sql.functions._
import graft.cluster.KMeans
import graft.core.Metric

/** Clustering checked by metric properties, not exact labels (reference
  * discipline: kmeans_test_blobs.cuh — blobs + inertia/agreement). The
  * embeddings fixture is 10 Gaussian blobs with `label` as blob id. */
class KMeansSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")

  test("fit on blob data beats random purity (fixture blobs overlap: numpy Lloyd gets ~0.17)") {
    val (model, labeled) = KMeans.fitPredict(emb,
      KMeans.Params(k = 10, maxIter = 20), "vec_id", "embedding")
    assert(model.iterations >= 1)
    // purity: each k-means cluster dominated by one true blob label
    val purity = labeled.groupBy(col("cluster"), col("label")).count()
      .groupBy(col("cluster")).agg(max(col("count")).as("maxc"), sum(col("count")).as("n"))
      .agg(sum(col("maxc")).cast("double") / sum(col("n"))).head().getDouble(0)
    assert(purity >= 0.14, s"purity $purity") // random-assignment baseline is ~0.10
  }

  test("distributed fit == driver-side naive Lloyd with identical init") {
    val k = 8; val iters = 5
    val model = KMeans.fit(emb, KMeans.Params(k, maxIter = iters, tol = 0.0), "vec_id", "embedding")
    // replicate: same seeded-hash init, same loop, on collected data
    val data = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val init = emb
      .orderBy(xxhash64(col("vec_id"), lit(42L)), col("vec_id"))
      .limit(k).select("embedding").collect().map(_.getSeq[Float](0).toArray)
    var cents = init
    for (_ <- 1 to iters) {
      val assign = data.map { case (_, v) =>
        cents.zipWithIndex.minBy { case (c, i) => (graft.core.Distance.l2(v, c), i) }._2
      }
      cents = Array.tabulate(k) { c =>
        val members = data.zip(assign).collect { case ((_, v), a) if a == c => v }
        if (members.isEmpty) cents(c)
        else {
          val s = new Array[Double](64)
          members.foreach(v => (0 until 64).foreach(i => s(i) += v(i)))
          s.map(x => (x / members.length).toFloat)
        }
      }
    }
    val got = model.centroidArrays.sortBy(_.head)
    val exp = cents.sortBy(_.head)
    got.zip(exp).foreach { case (g, e) =>
      assert(graft.core.Distance.l2Sqrt(g, e) < 1e-4)
    }
  }

  test("ArrayInit: maxIter=0 returns the given centroids verbatim") {
    val given = Array(Array.fill(64)(0.25f), Array.fill(64)(-0.25f))
    val m = KMeans.fit(emb, KMeans.Params(k = 2, maxIter = 0,
      init = KMeans.ArrayInit(given)), "vec_id", "embedding")
    assert(m.iterations == 0)
    m.centroidArrays.zip(given).foreach { case (a, b) => assert(a.sameElements(b)) }
    intercept[IllegalArgumentException] {
      KMeans.fit(emb, KMeans.Params(k = 3, maxIter = 0,
        init = KMeans.ArrayInit(given)), "vec_id", "embedding")
    }
  }

  test("PlusPlusInit is deterministic and no worse than the random init on blobs") {
    val pp1 = KMeans.fit(emb, KMeans.Params(k = 10, maxIter = 10,
      init = KMeans.PlusPlusInit), "vec_id", "embedding")
    val pp2 = KMeans.fit(emb, KMeans.Params(k = 10, maxIter = 10,
      init = KMeans.PlusPlusInit), "vec_id", "embedding")
    assert(pp1.inertia == pp2.inertia, "k-means|| init must be seed-deterministic")
    pp1.centroidArrays.zip(pp2.centroidArrays).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    val rnd = KMeans.fit(emb, KMeans.Params(k = 10, maxIter = 10,
      init = KMeans.RandomInit), "vec_id", "embedding")
    // on the 10-blob fixture the D^2-weighted oversample should spread
    // across blobs at least as well as a uniform pick
    assert(pp1.inertia <= rnd.inertia * 1.02,
      s"k-means|| ${pp1.inertia} vs random ${rnd.inertia}")
  }

  test("more iterations never increase inertia") {
    val m1 = KMeans.fit(emb, KMeans.Params(k = 10, maxIter = 1), "vec_id", "embedding")
    val m5 = KMeans.fit(emb, KMeans.Params(k = 10, maxIter = 5), "vec_id", "embedding")
    assert(m5.inertia <= m1.inertia + 1e-6, s"${m5.inertia} vs ${m1.inertia}")
  }

  test("nInit restarts never return worse inertia than the single run") {
    val one = KMeans.fit(emb, KMeans.Params(k = 10, maxIter = 5), "vec_id", "embedding")
    val multi = KMeans.fit(emb, KMeans.Params(k = 10, maxIter = 5, nInit = 3),
      "vec_id", "embedding")
    assert(multi.inertia <= one.inertia + 1e-6, s"${multi.inertia} vs ${one.inertia}")
  }

  test("predict assigns every row a cluster in [0, k) with finite dist") {
    val model = KMeans.fit(emb, KMeans.Params(k = 4, maxIter = 5), "vec_id", "embedding")
    val p = KMeans.predict(emb, model.centroids, "embedding")
    assert(p.filter(col("cluster") < 0 || col("cluster") >= 4).count() == 0)
    assert(p.filter(col("dist") < 0).count() == 0)
    assert(p.count() == emb.count())
  }

  test("clusterCost equals sum of assigned dists") {
    val model = KMeans.fit(emb, KMeans.Params(k = 4, maxIter = 5), "vec_id", "embedding")
    val viaPredict = KMeans.predict(emb, model.centroids, "embedding")
      .agg(sum(col("dist"))).head().getDouble(0)
    val cost = KMeans.clusterCost(emb, model.centroids, "embedding")
    assert(math.abs(viaPredict - cost) / cost < 1e-9)
  }

  test("balanced fit: no cluster starves below the balance floor") {
    val k = 16
    val ratio = 0.25
    val n = emb.count()
    val model = KMeans.fitBalanced(emb, KMeans.Params(k = k, maxIter = 25),
      ratio, "vec_id", "embedding")
    val sizes = KMeans.predict(emb, model.centroids, "embedding")
      .groupBy(col("cluster")).count().collect().map(_.getLong(1))
    assert(sizes.length == k, s"only ${sizes.length} nonempty clusters")
    val minSize = sizes.min
    assert(minSize >= ratio * n / k, s"min cluster size $minSize below floor")
  }

  test("trainsetCap: capped training is deterministic, valid, and close in cost") {
    // the cap only bounds what the Lloyd ITERATIONS see; the model must
    // stay a valid full-data model (inertia over every row) and the
    // hash-picked subset must make reruns bit-identical. The distributed
    // path is forced so the cap's subset logic actually runs.
    spark.conf.set("spark.graft.localKernel.enabled", "false")
    try {
      val p = KMeans.Params(k = 8, maxIter = 10, trainsetCap = 64)
      val a = KMeans.fit(emb, p, "vec_id", "embedding")
      val b = KMeans.fit(emb, p, "vec_id", "embedding")
      assert(a.centroidArrays.zip(b.centroidArrays)
        .forall { case (x, y) => x.sameElements(y) },
        "capped training not deterministic")
      val full = KMeans.fit(emb, p.copy(trainsetCap = 0), "vec_id", "embedding")
      assert(a.inertia > 0 && a.inertia <= full.inertia * 2.0,
        s"capped inertia ${a.inertia} vs full ${full.inertia}")
    } finally spark.conf.set("spark.graft.localKernel.enabled", "true")
  }

  test("transform emits k positional distances, min matches predict dist") {
    val model = KMeans.fit(emb, KMeans.Params(k = 4, maxIter = 3), "vec_id", "embedding")
    val t = KMeans.transform(emb, model.centroids, "embedding")
    assert(t.select(size(col("dists"))).head().getInt(0) == 4)
    val bad = t.withColumn("minD", array_min(col("dists")))
      .join(KMeans.predict(emb, model.centroids, "embedding")
        .select(col("vec_id"), col("dist")), "vec_id")
      .filter(abs(col("minD") - col("dist")) > 1e-9)
    assert(bad.count() == 0)
  }
}
