package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.plans.{KnnJoinPlan, ResolveKnnJoin}

/** Scratch: inspect KnnJoinPlan lowering (not shipped). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ResolveKnnJoin(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val declared = KnnJoinPlan.knnJoin(emb, q, 5, Metric.L2Sqrt, "vec_id", "embedding")
    println("=== analyzed ===")
    println(declared.queryExecution.analyzed.treeString.take(1500))
    println("=== optimized ===")
    println(declared.queryExecution.optimizedPlan.treeString.take(2500))
    println("=== collect ===")
    println(declared.limit(3).collect().mkString("; "))
    spark.stop()
  }
}
