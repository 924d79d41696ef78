package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Metric
import graft.ops.BruteForceKnn

/** NN-descent kNN-graph refinement — `cuvs::neighbors::nn_descent`
  * (nn_descent.hpp:61-76: graph_degree=64, max_iterations=20,
  * termination_threshold=1e-4; GNND).
  *
  * The classic iterative self-join: neighbors-of-neighbors become
  * candidates, distances are computed once per candidate pair, and the
  * per-node top-k merges candidates with the current graph. Each round is
  * localCheckpoint'ed to cut lineage (SURVEY.md §7.4 hard part 1).
  */
object NnDescent {

  case class Params(k: Int = 10, maxIterations: Int = 10,
      terminationThreshold: Double = 1e-3, seed: Long = 42,
      metric: Metric = Metric.L2)

  /** Edge list (src, dst, dist, rank) of the refined kNN graph. */
  def build(df: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val data = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = data.count()

    // seeded random initial graph: k pseudo-random neighbors per node
    var graph = data.select(col("id").as("src"))
      .select(col("src"), explode(sequence(lit(1), lit(params.k))).as("j"))
      .select(col("src"),
        pmod(xxhash64(col("src"), col("j"), lit(params.seed)), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .join(data.select(col("id").as("dst"), col("vec").as("dvec")), "dst")
      .join(data.select(col("id").as("src"), col("vec").as("svec")), "src")
      .select(col("src"), col("dst"),
        graft.functions.vector_distance(params.metric, col("svec"), col("dvec")).as("dist"))
      .localCheckpoint()

    var it = 0
    var updateRate = 1.0
    while (it < params.maxIterations && updateRate > params.terminationThreshold) {
      // candidates: 2-hop neighbors (and reverse edges join both directions)
      val und = graph.select(col("src"), col("dst"))
        .unionByName(graph.select(col("dst").as("src"), col("src").as("dst")))
      val cand = und.as("e1").join(und.as("e2"), col("e1.dst") === col("e2.src"))
        .filter(col("e1.src") =!= col("e2.dst"))
        .select(col("e1.src").as("src"), col("e2.dst").as("dst"))
        .distinct()
        .join(data.select(col("id").as("dst"), col("vec").as("dvec")), "dst")
        .join(data.select(col("id").as("src"), col("vec").as("svec")), "src")
        .select(col("src"), col("dst"),
          graft.functions.vector_distance(params.metric, col("svec"), col("dvec")).as("dist"))
      val merged = BruteForceKnn.topKPerQuery(
          graph.unionByName(cand).distinct()
            .select(col("src").as("qid"), col("dst").as("_nid"), col("dist")),
          params.k, params.metric)
        .select(col("qid").as("src"), col("nbr_id").as("dst"), col("dist"))
        .localCheckpoint()
      // terminationThreshold <= 0 opts out of the convergence check — one
      // fewer action per round when the caller runs a fixed iteration count
      if (params.terminationThreshold > 0) {
        val changed = merged.select(col("src"), col("dst"))
          .exceptAll(graph.select(col("src"), col("dst"))).count()
        updateRate = changed.toDouble / (n * params.k)
      }
      graph = merged
      it += 1
    }
    data.unpersist()
    graph.withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dist"), col("dst"))))
  }
}
