package graft

import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.ops.BruteForceKnn
import graft.plans.{KnnJoinPlan, ResolveKnnJoin}

/** The declarative KnnJoin Catalyst node: the optimizer rule must lower it
  * to the partial-top-k pipeline with results identical to the direct API,
  * and enclosing operators (filters/projections over the node) must keep
  * composing — the attribute re-aliasing contract. */
class KnnJoinPlanSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def ensureRule(): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[ResolveKnnJoin]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ResolveKnnJoin(spark)

  /** The index-route tests exercise the LOWERING, so the plan-time stats
    * gate (which would route the tiny fixture to brute force) is disabled
    * for their duration; the gate has its own routing-decision test. */
  private def withIndexGateOff[T](body: => T): T = {
    spark.conf.set("spark.graft.knnJoin.minIndexRows", "0")
    try body finally spark.conf.unset("spark.graft.knnJoin.minIndexRows")
  }

  test("declarative node lowers to the same rows as the direct API") {
    ensureRule()
    val declared = KnnJoinPlan.knnJoin(emb, queries, 10, Metric.L2Sqrt,
      "vec_id", "embedding")
    val direct = BruteForceKnn.knnJoin(emb, queries, 10, Metric.L2Sqrt,
      "vec_id", "embedding")
      .select(col("qid").cast("long"), col("nbr_id").cast("long"), col("rank"), col("dist"))
    assert(declared.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(declared).count() == 0)
  }

  test("operators compose over the node (filter + projection + agg)") {
    ensureRule()
    val out = KnnJoinPlan.knnJoin(emb, queries, 10, Metric.L2Sqrt, "vec_id", "embedding")
      .filter(col("rank") <= 3)
      .groupBy(col("qid")).agg(count(lit(1)).as("n"), max(col("dist")).as("worst"))
    val rows = out.collect()
    assert(rows.length == queries.count())
    assert(rows.forall(_.getLong(1) == 3))
  }

  test("registered IVF layout reroutes the join through the index, exactly") {
    ensureRule()
    val dataPath = s"${SparkTestBase.sf0001}/embeddings.parquet"
    val idxPath = java.nio.file.Files.createTempDirectory("knnroute").toString
    val idx = graft.index.IvfFlatIndex.build(emb,
      graft.index.IvfFlatIndex.Params(nLists = 8, nIters = 5), "vec_id", "embedding")
    idx.save(idxPath)
    graft.plans.GraftIndexCatalog.register(dataPath, idxPath, nProbes = 8, kCoarse = 30)
    try withIndexGateOff {
      val routed = KnnJoinPlan.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
      // full probes + refine == exact brute force, via the index route
      val direct = BruteForceKnn.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
        .select(col("qid").cast("long"), col("nbr_id").cast("long"), col("rank"), col("dist"))
      assert(routed.exceptAll(direct).count() == 0)
      assert(direct.exceptAll(routed).count() == 0)
      // the physical plan reads the saved index lists, not a cross join
      val physical = routed.queryExecution.executedPlan.toString
      assert(physical.contains("list_id"), s"expected index-route plan:\n$physical")
    } finally graft.plans.GraftIndexCatalog.unregister(dataPath)
  }

  test("a row-reduced data child bypasses its registered index (exact fallback)") {
    // the index routes search the node's CHILD frame: over a filtered
    // child, index-generated candidates inner-join away and the result
    // silently under-returns k — so any non-population-preserving left
    // (a Filter, the filtered TVF's anti join) must take the brute
    // route, which is exact over the filtered relation
    ensureRule()
    val dataPath = s"${SparkTestBase.sf0001}/embeddings.parquet"
    val idxPath = java.nio.file.Files.createTempDirectory("knnfiltroute").toString
    val idx = graft.index.IvfFlatIndex.build(emb,
      graft.index.IvfFlatIndex.Params(nLists = 8, nIters = 5), "vec_id", "embedding")
    idx.save(idxPath)
    // deliberately CORRUPTING registration if routed: 1 probe, kCoarse =
    // k — any index-route leakage shows up as missing/misranked rows
    graft.plans.GraftIndexCatalog.register(dataPath, idxPath, nProbes = 1, kCoarse = 10)
    try withIndexGateOff {
      // Column API over a filtered child
      val filteredData = emb.filter(col("vec_id") % 3 =!= 0)
      val viaNode = KnnJoinPlan.knnJoin(filteredData, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
      val exact = BruteForceKnn.knnJoin(filteredData, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
        .select(col("qid").cast("long"), col("nbr_id").cast("long"), col("rank"), col("dist"))
      assert(viaNode.collect().toSet == exact.collect().toSet,
        "filtered child must take the exact brute route, not the index")
      // SQL filtered TVF over the same registered relation
      graft.functions.SqlFunctions.register(spark)
      emb.createOrReplaceTempView("kjf_emb")
      queries.createOrReplaceTempView("kjf_q")
      emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
        .createOrReplaceTempView("kjf_deny")
      val viaSql = spark.sql(
        "SELECT * FROM knn_join_filtered('kjf_emb', 'kjf_q', 'kjf_deny', 'deny', " +
          "10, 'l2sqrt', 'vec_id', 'embedding', 'qid', 'qvec')")
      assert(viaSql.collect().toSet == exact.collect().toSet,
        "filtered TVF must take the exact brute route, not the index")
      // while an UNfiltered join over the same relation still routes
      // (column-pruned Project wrappers are population-preserving)
      val routed = KnnJoinPlan.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
      val physical = routed.queryExecution.executedPlan.toString
      assert(physical.contains("list_id"),
        s"unfiltered join lost its index route:\n$physical")
    } finally graft.plans.GraftIndexCatalog.unregister(dataPath)
  }

  test("cost-based probe selection (nProbes = 0) picks a sound probe count") {
    ensureRule()
    val dataPath = s"${SparkTestBase.sf0001}/embeddings.parquet"
    val idxPath = java.nio.file.Files.createTempDirectory("knnauto").toString
    val idx = graft.index.IvfFlatIndex.build(emb,
      graft.index.IvfFlatIndex.Params(nLists = 8, nIters = 5), "vec_id", "embedding")
    idx.save(idxPath)
    graft.plans.GraftIndexCatalog.register(dataPath, idxPath) // nProbes = 0 = auto
    try withIndexGateOff {
      val routed = KnnJoinPlan.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
      val exact = BruteForceKnn.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding").select(col("qid"), col("nbr_id"))
      val matched = routed.select(col("qid"), col("nbr_id")).intersect(exact).count()
      val recall = matched.toDouble / exact.count()
      // fixture: nLists=8, auto fraction 0.5 -> 4 probes; recall must clear
      // the probe-fraction floor comfortably on the fixed fixture
      assert(routed.count() == queries.count() * 10)
      assert(recall >= 0.6, s"auto-probe recall $recall")
    } finally graft.plans.GraftIndexCatalog.unregister(dataPath)
  }

  test("registered HNSW layout routes the join through beam search + refine") {
    ensureRule()
    val dataPath = s"${SparkTestBase.sf0001}/embeddings.parquet"
    val idxPath = java.nio.file.Files.createTempDirectory("knnhnsw").toString
    val e = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val base = graft.graphops.AllNeighbors.exact(e, 16, Metric.L2, "id", "vec")
    val idx = graft.index.Hnsw.fromGraph(base, e, graft.index.Hnsw.Params(m = 16), "id", "vec")
    graft.index.Hnsw.save(idx, idxPath)
    graft.plans.GraftIndexCatalog.register(dataPath, idxPath, kCoarse = 40)
    try withIndexGateOff {
      val routed = KnnJoinPlan.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
      assert(routed.count() == queries.count() * 10)
      val exact = BruteForceKnn.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding").select(col("qid"), col("nbr_id"))
      val recall = routed.select(col("qid"), col("nbr_id")).intersect(exact).count()
        .toDouble / exact.count()
      assert(recall >= 0.85, s"hnsw-route recall $recall")
      // refined distances are exact for whatever candidates survive
      val self = routed.filter(col("qid") === col("nbr_id"))
      assert(self.filter(col("dist") =!= 0.0).count() == 0)
    } finally graft.plans.GraftIndexCatalog.unregister(dataPath)
  }

  test("unknown registered layout falls back to brute force, not a plan-time crash") {
    ensureRule()
    val dataPath = s"${SparkTestBase.sf0001}/embeddings.parquet"
    val idxPath = java.nio.file.Files.createTempDirectory("knnscann").toString
    // a ScaNN layout: valid index, but one the resolver has no route for
    graft.index.ScannIndex.build(emb,
      graft.index.ScannIndex.Params(nLeaves = 8, nIters = 3, pqBits = 4),
      "vec_id", "embedding").save(idxPath)
    graft.plans.GraftIndexCatalog.register(dataPath, idxPath)
    try {
      val routed = KnnJoinPlan.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
      val direct = BruteForceKnn.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
        .select(col("qid").cast("long"), col("nbr_id").cast("long"), col("rank"), col("dist"))
      assert(routed.exceptAll(direct).count() == 0)
      assert(direct.exceptAll(routed).count() == 0)
    } finally graft.plans.GraftIndexCatalog.unregister(dataPath)
  }

  test("stats gate: a small relation bypasses its registered index; conf opt-out restores it") {
    ensureRule()
    val dataPath = s"${SparkTestBase.sf0001}/embeddings.parquet"
    val idxPath = java.nio.file.Files.createTempDirectory("knngate").toString
    graft.index.IvfFlatIndex.build(emb,
      graft.index.IvfFlatIndex.Params(nLists = 8, nIters = 5), "vec_id", "embedding")
      .save(idxPath)
    graft.plans.GraftIndexCatalog.register(dataPath, idxPath, nProbes = 8, kCoarse = 30)
    try {
      // default minIndexRows (100k) >> fixture rows: the planner's stats
      // gate must choose brute force even though an index is registered
      val gated = KnnJoinPlan.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
      val direct = BruteForceKnn.knnJoin(emb, queries, 10, Metric.L2Sqrt,
        "vec_id", "embedding")
        .select(col("qid").cast("long"), col("nbr_id").cast("long"), col("rank"), col("dist"))
      assert(gated.exceptAll(direct).count() == 0 && direct.exceptAll(gated).count() == 0)
      assert(!gated.queryExecution.executedPlan.toString.contains("list_id"),
        "stats gate should have routed the small relation to brute force")
      // threshold below the fixture size: the index route comes back
      spark.conf.set("spark.graft.knnJoin.minIndexRows", "1")
      try {
        val routed = KnnJoinPlan.knnJoin(emb, queries, 10, Metric.L2Sqrt,
          "vec_id", "embedding")
        assert(routed.queryExecution.executedPlan.toString.contains("list_id"),
          "low threshold should restore the index route")
        assert(routed.count() == queries.count() * 10)
      } finally spark.conf.unset("spark.graft.knnJoin.minIndexRows")
    } finally graft.plans.GraftIndexCatalog.unregister(dataPath)
  }

  test("plan shows the partial-top-k aggregate, not a raw cross join sort") {
    ensureRule()
    val physical = KnnJoinPlan.knnJoin(emb, queries, 5, Metric.L2, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(physical.contains("topk") || physical.contains("TopK") ||
      physical.contains("ObjectHashAggregate") || physical.contains("SortAggregate"),
      s"unexpected physical plan:\n$physical")
  }

  test("filtered TVF plans a BROADCAST anti join under the top-k, never sort-merge") {
    // the deny list is the classic small side; at 100 TB a sort-merge
    // anti join here would shuffle the whole data relation on id before
    // the kNN even starts
    ensureRule()
    graft.functions.SqlFunctions.register(spark)
    emb.createOrReplaceTempView("kjp_emb")
    queries.createOrReplaceTempView("kjp_q")
    emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
      .createOrReplaceTempView("kjp_deny")
    val df = spark.sql(
      "SELECT * FROM knn_join_filtered('kjp_emb', 'kjp_q', 'kjp_deny', 'deny', " +
        "5, 'l2sqrt', 'vec_id', 'embedding', 'qid', 'qvec')")
    df.queryExecution.executedPlan.execute().count() // settle AQE
    val physical = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(physical.contains("BroadcastHashJoin") && physical.contains("LeftAnti"),
      s"expected a broadcast anti join in:\n$physical")
    assert(!physical.contains("SortMergeJoin"),
      s"filter must not sort-merge the data relation:\n$physical")
    assert(!physical.contains("CartesianProduct"),
      s"no cartesian product allowed:\n$physical")
  }
}
