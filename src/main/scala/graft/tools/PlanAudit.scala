package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric

/** Scratch: formatted-plan audit of the flagship DISTRIBUTED routes (the
  * 100 TB paths — LocalKernel disabled), checking shuffle counts,
  * broadcast placement, pushed filters and scan pruning. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.localKernel.enabled", "false")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    def audit(name: String)(df0: => org.apache.spark.sql.DataFrame): Unit = {
      val df = df0
      // run THIS QueryExecution (count() would plan a new one) so AQE
      // finalizes stages and codegen markers appear; RDD-level count avoids
      // collecting the (possibly huge) result to the driver
      df.queryExecution.executedPlan.execute().count()
      // AQE's toString prints Final AND Initial plans — count the final only
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val nShuffle = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
        .findAllIn(plan).length
      val nBcast = "BroadcastExchange".r.findAllIn(plan).length
      // executedPlan.toString marks codegen stages "*(n) Op"; count stages
      val nWsc = raw"\*\(\d+\)".r.findAllIn(plan).map(_.toString).toSet.size
      println(s"== $name: shuffles=$nShuffle broadcasts=$nBcast codegenSpans=$nWsc")
      if (args.length > 1 && args(1) == "-v") println(df.queryExecution.executedPlan.treeString)
    }

    audit("bruteforce knnJoin") {
      graft.ops.BruteForceKnn.knnJoin(emb, q, 10, Metric.L2, "vec_id", "embedding") }
    val ivf = graft.index.IvfFlatIndex.build(emb,
      graft.index.IvfFlatIndex.Params(nLists = 16, nIters = 5), "vec_id", "embedding")
    audit("ivf search (in-memory)") { ivf.search(q, 10, nProbes = 4) }
    audit("pairwise eps join") {
      graft.ops.PairwiseDistance.epsNeighborhood(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        3.0, Metric.L2Sqrt, "id", "vec", "id", "vec") }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    audit("minhash lsh pairs") {
      graft.text.Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 5, numHashes = 64, bandRows = 4, minJaccard = 0.5) }
    audit("sparse knn cosine") {
      val sv = emb.select(col("vec_id").as("id"),
        expr("filter(transform(embedding, (v, i) -> struct(i AS idx, v AS value)), x -> x.value > 0.5)").as("nz"))
        .select(col("id"), expr("transform(nz, x -> x.idx)").as("indices"),
          expr("transform(nz, x -> x.value)").as("values"))
      val sq = sv.filter(col("id") % 20 === 0)
        .select(col("id").as("qid"), col("indices").as("qindices"), col("values").as("qvalues"))
      graft.ops.SparseKnn.knnJoin(sv, sq, 10, Metric.Cosine) }
    spark.stop()
  }
}
