package graft.graphops

import scala.collection.mutable.ArrayBuffer

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
    val init = data.select(col("id").as("src"))
      .select(col("src"), explode(sequence(lit(1), lit(params.k))).as("j"))
      .select(col("src"),
        pmod(xxhash64(col("src"), col("j"), lit(params.seed)), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .join(data.select(col("id").as("dst"), col("vec").as("dvec")), "dst")
      .join(data.select(col("id").as("src"), col("vec").as("svec")), "src")
      .select(col("src"), col("dst"),
        graft.functions.vector_distance(params.metric, col("svec"), col("dvec")).as("dist"))

    // Cost-based route (LocalKernel): each refinement round is a self-join
    // + top-k + checkpoint job; on a collectable graph the rounds run in
    // memory over the Spark-computed seeded init, mirrored exactly
    // (2-hop candidate set, same distinct/merge, same (dist, id) top-k,
    // same update-rate termination, same final (dist, dst) rank window).
    val sparkS = df.sparkSession
    if (LocalKernel.enabled(sparkS) && n <= LocalKernel.maxVectors(sparkS) &&
        n * params.k <= LocalKernel.maxEdges(sparkS)) {
      try return buildLocal(data, init, n, params)
      finally data.unpersist()
    }

    var graph = init.localCheckpoint()
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

  /** In-memory twin of the refinement loop (see build). */
  private def buildLocal(data: DataFrame, init: DataFrame, n: Long,
      params: Params): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val vecs = new java.util.HashMap[Long, Array[Float]]()
    data.as[(Long, Array[Float])].collect().foreach { case (i, v) => vecs.put(i, v) }
    val distFn = graft.core.Distance.fn(params.metric)
    val minClose = Metric.isMinClose(params.metric)

    // graph state: per-src sorted-by-(dist,dst) top-k edge arrays
    var graph: Map[Long, Array[(Long, Double)]] =
      init.as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (s, es) => s -> es.map(e => (e._2, e._3)) }

    def edgePairs: Set[(Long, Long)] =
      graph.iterator.flatMap { case (s, es) => es.iterator.map(e => (s, e._1)) }.toSet

    var it = 0
    var updateRate = 1.0
    while (it < params.maxIterations && updateRate > params.terminationThreshold) {
      val prevPairs = edgePairs
      // undirected adjacency
      val und = new java.util.HashMap[Long, ArrayBuffer[Long]]()
      def addU(a: Long, b: Long): Unit = {
        var buf = und.get(a)
        if (buf == null) { buf = new ArrayBuffer[Long](); und.put(a, buf) }
        buf += b
      }
      prevPairs.foreach { case (s, d) => addU(s, d); addU(d, s) }
      // merged top-k per node over current edges + distinct 2-hop candidates
      val next = scala.collection.mutable.Map.empty[Long, Array[(Long, Double)]]
      und.forEach { (s, nbrs) =>
        val cand = new java.util.HashSet[Long]()
        graph.get(s).foreach(_.foreach(e => cand.add(e._1)))
        val n1 = nbrs.toArray.distinct
        n1.foreach { mid =>
          val two = und.get(mid)
          if (two != null) two.foreach { d => if (d != s) cand.add(d) }
        }
        if (!cand.isEmpty) {
          val sv = vecs.get(s)
          val scored = new ArrayBuffer[(Long, Double)](cand.size)
          cand.forEach(d => scored += ((d, distFn(sv, vecs.get(d)))))
          val ord: Ordering[(Long, Double)] =
            if (minClose) Ordering.by(e => (e._2, e._1))
            else Ordering.by((e: (Long, Double)) => (-e._2, e._1))
          next(s) = scored.sorted(ord).take(params.k).toArray
        }
      }
      graph = next.toMap
      if (params.terminationThreshold > 0) {
        val changed = (edgePairs -- prevPairs).size
        updateRate = changed.toDouble / (n * params.k)
      }
      it += 1
    }
    val rows = graph.toSeq.flatMap { case (s, es) =>
      es.sortBy(e => (e._2, e._1)).zipWithIndex.map { case ((d, dist), i) =>
        (s, d, dist, i + 1)
      }
    }
    spark.createDataFrame(rows).toDF("src", "dst", "dist", "rank")
  }
}
