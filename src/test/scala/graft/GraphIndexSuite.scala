package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Distance, Metric}
import graft.graphops.{AllNeighbors, CagraOptimize, GraphSearch, Vamana}
import graft.index.Hnsw
import graft.ops.BruteForceKnn

/** Vamana build (alpha-RNG prune), CAGRA-style graph search, and the HNSW
  * hierarchy — reference discipline: degree caps, prune-property
  * soundness, recall floors vs exact search (vamana.hpp:59-82,
  * cagra.hpp:269-355, hnsw.hpp:43-65). */
class GraphIndexSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.filter(col("id") % 50 === 0)
    .select(col("id").as("qid"), col("vec").as("qvec"))

  private def recallVsExact(got: DataFrame, k: Int): Double = {
    val exact = BruteForceKnn.knnJoin(emb, queries, k, Metric.L2, "id", "vec")
      .select(col("qid"), col("nbr_id"))
    got.select(col("qid"), col("nbr_id")).intersect(exact).count().toDouble / exact.count()
  }

  test("vamana: degree cap and alpha-RNG prune property hold") {
    val params = Vamana.Params(graphDegree = 12, visitedSize = 32, alpha = 1.2)
    val g = Vamana.build(emb, params, "id", "vec").cache()
    val maxDeg = g.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= 12)
    // prune property: for every kept edge (p, c), no other kept neighbor w
    // of p (closer to p than c) satisfies alpha*d(w,c) <= d(p,c)
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).toArray).toMap
    val fn = Distance.fn(Metric.L2Sqrt)
    val bySrc = g.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    bySrc.values.foreach { edges =>
      val sorted = edges.sortBy(e => (e._3, e._2))
      for (i <- sorted.indices; j <- 0 until i) {
        val (_, c, dc) = sorted(i)
        val (_, w, _) = sorted(j)
        assert(params.alpha * fn(vecs(w), vecs(c)) > dc,
          s"edge to $c should have been pruned by kept neighbor $w")
      }
    }
  }

  test("vamana graph + graph search meets the recall floor") {
    val g = Vamana.build(emb, Vamana.Params(graphDegree = 16, visitedSize = 32), "id", "vec")
    val got = GraphSearch.search(g.select(col("src"), col("dst")), emb, queries, 10,
      GraphSearch.Params(itopk = 40, searchWidth = 4, maxIterations = 12), "id", "vec")
    val r = recallVsExact(got, 10)
    assert(r >= 0.9, s"recall $r")
  }

  test("cagra graph + graph search meets the recall floor") {
    val knn = AllNeighbors.exact(emb, 16, Metric.L2Sqrt, "id", "vec")
    val g = CagraOptimize.optimize(knn.select(col("src"), col("dst"), col("dist")), degree = 8)
    val got = GraphSearch.search(g.select(col("src"), col("dst")), emb, queries, 10,
      GraphSearch.Params(itopk = 40, searchWidth = 4, maxIterations = 12), "id", "vec")
    val r = recallVsExact(got, 10)
    assert(r >= 0.9, s"recall $r")
  }

  test("filtered cagra search: only allowed ids returned, recall floor vs filtered exact") {
    val knn = AllNeighbors.exact(emb, 16, Metric.L2Sqrt, "id", "vec")
    val g = CagraOptimize.optimize(knn.select(col("src"), col("dst"), col("dist")), degree = 8)
    val allow = emb.filter(col("id") % 3 =!= 0).select(col("id"))
    val got = GraphSearch.searchFiltered(g.select(col("src"), col("dst")), emb, queries, 10,
      GraphSearch.Params(itopk = 40, searchWidth = 4, maxIterations = 20), allow, "id", "vec")
      .cache()
    assert(got.join(allow.withColumnRenamed("id", "nbr_id"), Seq("nbr_id"), "left_anti")
      .count() == 0, "a filtered-out id leaked into the result")
    // every query keeps k results despite the filter (the rate-widened beam)
    val minPerQ = got.groupBy("qid").count().agg(min("count")).head().getLong(0)
    assert(minPerQ == 10, s"short result list: $minPerQ")
    val exact = BruteForceKnn.knnJoin(emb.filter(col("id") % 3 =!= 0), queries, 10,
      Metric.L2, "id", "vec").select(col("qid"), col("nbr_id"))
    val r = got.select(col("qid"), col("nbr_id")).intersect(exact).count().toDouble / exact.count()
    assert(r >= 0.8, s"filtered recall $r")
  }

  test("hnsw extend is exactly fromGraph over the CagraExtend'd base layer") {
    // the contract GraphQueries.hnswExtendQuery relies on to share the
    // extended layer 0 with cagra_extend_recall: extending a hierarchy is
    // the same index as rebuilding the hierarchy over the extended graph
    val baseRows = emb.filter(col("id") % 10 =!= 0)
    val addRows = emb.filter(col("id") % 10 === 0)
    val baseGraph = CagraOptimize.optimize(
      AllNeighbors.exact(baseRows, 16, Metric.L2Sqrt, "id", "vec")
        .select(col("src"), col("dst"), col("dist")), degree = 8)
    val params = Hnsw.Params(m = 16, metric = Metric.L2Sqrt)
    val built = Hnsw.fromGraph(baseGraph, baseRows, params, "id", "vec")
    val viaExtend = Hnsw.extend(built, baseRows, addRows)
    val composed = Hnsw.fromGraph(
      graft.graphops.CagraExtend.extend(baseGraph, baseRows, addRows, 8,
        graft.graphops.CagraExtend.Params(metric = Metric.L2Sqrt)),
      baseRows.unionByName(addRows), params, "id", "vec")
    assert(viaExtend.maxLevel == composed.maxLevel)
    assert(viaExtend.entryPoint == composed.entryPoint)
    assert(viaExtend.levels.except(composed.levels).count() == 0 &&
      composed.levels.except(viaExtend.levels).count() == 0)
    val a = viaExtend.edges.select("level", "src", "dst", "rank")
    val b = composed.edges.select("level", "src", "dst", "rank")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0,
      "extend and compose disagree on the hierarchy's edges")
  }

  test("hnsw: level layout is geometric and search meets the recall floor") {
    val levels = Hnsw.assignLevels(emb, Hnsw.Params(m = 16), "id")
    val n = levels.count()
    val upper = levels.filter(col("level") >= 1).count()
    // P(level >= 1) = 1/M = 1/16; allow generous slack on 500 draws
    assert(upper > n / 64 && upper < n / 4, s"upper-layer population $upper of $n")

    val base = AllNeighbors.exact(emb, 16, Metric.L2Sqrt, "id", "vec")
    val idx = Hnsw.fromGraph(base, emb, Hnsw.Params(m = 16), "id", "vec")
    assert(idx.maxLevel >= 1)
    val got = Hnsw.search(idx, emb, queries, 10, ef = 40, "id", "vec")
    val r = recallVsExact(got, 10)
    assert(r >= 0.9, s"recall $r")
  }
}
