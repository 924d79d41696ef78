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
