package graft

import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.index.IvfFlatIndex
import graft.ops.BruteForceKnn

/** Physical-plan shape assertions — the ".explain and iterate" discipline:
  * these lock in the scale properties the design depends on, so a
  * regression that silently de-broadcasts or de-partializes fails CI. */
class PlanSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("brute-force kNN: queries broadcast, partial top-k before the shuffle") {
    // pin the at-scale route: the fused select_k kernel (LocalKernel) is
    // plan-shape-checked separately in LocalKernelSuite
    spark.conf.set("spark.graft.localKernel.enabled", "false")
    val plan =
      try BruteForceKnn.knnJoin(emb, queries, 10, Metric.L2, "vec_id", "embedding")
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.graft.localKernel.enabled", "true")
    // query side broadcasts — the dataset side must never shuffle wholesale
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"no broadcast in plan:\n$plan")
    // typed top-k aggregator plans as ObjectHashAggregate with a partial pass
    assert(plan.contains("ObjectHashAggregate"), s"no ObjectHashAggregate:\n$plan")
    val aggCount = "ObjectHashAggregate".r.findAllIn(plan).length
    assert(aggCount >= 2, s"expected partial+final aggregate, found $aggCount")
  }

  /** Execute the plan (so AQE finalizes), then count exchanges in the
    * FINAL plan only — toString also prints the initial plan. */
  private def executedCounts(df: org.apache.spark.sql.DataFrame): (Int, Int, Boolean) = {
    df.queryExecution.executedPlan.execute().count()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val shuffles = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(plan).length
    val bcasts = "BroadcastExchange".r.findAllIn(plan).length
    val cartesian = plan.contains("CartesianProduct")
    (shuffles, bcasts, cartesian)
  }

  private def distributedRoute[T](f: => T): T = {
    spark.conf.set("spark.graft.localKernel.enabled", "false")
    try f finally spark.conf.set("spark.graft.localKernel.enabled", "true")
  }

  test("exchange budget: brute-force kNN is 1 shuffle + 1 broadcast") {
    // the 100 TB contract (SURVEY §3.2): only O(q·k·parts) top-k rows may
    // shuffle — the single exchange is the partial->final top-k merge; the
    // dataset side streams, the query side broadcasts once
    val (shuffles, bcasts, cartesian) = distributedRoute {
      executedCounts(
        BruteForceKnn.knnJoin(emb, queries, 10, Metric.L2, "vec_id", "embedding"))
    }
    assert(shuffles == 1, s"brute-force must shuffle exactly once, got $shuffles")
    assert(bcasts == 1, s"query side must broadcast exactly once, got $bcasts")
    assert(!cartesian, "unbroadcast cartesian product in brute-force plan")
  }

  test("exchange budget: pairwise eps join is 0 shuffles + 1 broadcast") {
    val e = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val (shuffles, bcasts, _) = distributedRoute {
      executedCounts(graft.ops.PairwiseDistance.epsNeighborhood(
        e, e, 3.0, Metric.L2Sqrt, "id", "vec", "id", "vec"))
    }
    assert(shuffles == 0, s"eps join must not shuffle, got $shuffles")
    assert(bcasts == 1, s"one side must broadcast exactly once, got $bcasts")
  }

  test("exchange budget: minhash LSH pairs never cross-joins, bounded shuffles") {
    val docs = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
    val (shuffles, _, cartesian) = distributedRoute {
      executedCounts(graft.text.Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 8, numHashes = 16, bandRows = 4, minJaccard = 0.5))
    }
    assert(!cartesian, "LSH candidates must come from the band equi-join")
    assert(shuffles <= 6, s"LSH pipeline shuffle count grew to $shuffles")
  }

  test("exchange budget: IVF probe search bounded shuffles, no cartesian") {
    val ivf = IvfFlatIndex.build(emb, IvfFlatIndex.Params(nLists = 8, nIters = 3),
      "vec_id", "embedding")
    val (shuffles, _, cartesian) = distributedRoute {
      executedCounts(ivf.search(queries, 5, nProbes = 2))
    }
    assert(!cartesian, "IVF probe join must stay an equi-join")
    assert(shuffles <= 2, s"IVF search shuffle count grew to $shuffles")
  }

  test("per-group top-k over a low-cardinality key partial-aggregates (no window sort)") {
    // topk_pergroup's 3-value group key: a window form would shuffle the
    // full table onto 3 reducers and sort n/3 rows each for a 5-row answer;
    // the TopKAgg form must plan as partial+final ObjectHashAggregate with
    // no Window and no per-group sort of the base table
    val li = spark.read.parquet(s"${SparkTestBase.sf0001}/lineitem.parquet")
    val df = li.select(col("l_returnflag"), col("l_quantity").as("d"),
        (col("l_orderkey") * lit(8L) + col("l_linenumber")).as("cid"))
      .groupBy(col("l_returnflag"))
      .agg(graft.core.TopK.topk(5, minClose = false)(col("d"), col("cid")).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-group top-k regressed to a window:\n$plan")
    assert(!plan.contains("Sort "), s"per-group top-k sorts the base table:\n$plan")
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
  }

  test("predicate pushdown reaches the parquet scan") {
    val plan = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("embedding"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushedFilters"),
      s"no pushed filters:\n$plan")
  }

  test("column pruning: projecting two columns reads a two-column schema") {
    val plan = emb.select(col("vec_id")).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("label"),
      s"label column not pruned from scan:\n$plan")
  }

  test("saved IVF index search prunes unprobed list partitions (DPP)") {
    val dir = java.nio.file.Files.createTempDirectory("ivfplan").toString
    IvfFlatIndex.build(emb, IvfFlatIndex.Params(nLists = 8, nIters = 3),
      "vec_id", "embedding").save(dir)
    val loaded = IvfFlatIndex.load(spark, dir)
    val df = loaded.search(queries, 5, nProbes = 2)
    val plan = df.queryExecution.executedPlan.toString
    // the lists scan is partitioned by list_id and pruned either statically
    // (kernel route: the probed set is known at plan time -> IN filter on
    // the partition column) or dynamically (join route: DPP subquery)
    val staticPruned = "PartitionFilters: \\[[^\\]]*list_id[^\\]]*IN".r
      .findFirstIn(plan).isDefined
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning") ||
      plan.contains("PartitionFilters: [isnotnull(list_id") || staticPruned,
      s"no partition pruning on list_id:\n$plan")
    assert(df.count() == queries.count() * 5)
  }

  test("codegen: VectorDistance stays inside whole-stage codegen") {
    val df = emb.select(graft.functions.l2_distance(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      s"no whole-stage codegen span:\n$plan")
  }
}
