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

  /** maxSamples mirrors the reference GNND's per-node forward/reverse
    * sample cap (nn_descent.cuh:320-339, num_samples <= 32): each round,
    * every node's undirected adjacency is down-sampled to its maxSamples
    * hash-smallest neighbors BEFORE the 2-hop expansion, bounding the
    * candidate join at n*maxSamples^2 rows instead of n*(2k)^2. Default
    * 0 = disabled, preserving the exhaustive 2-hop semantics existing
    * callers validated against; large-graph_degree builds at scale
    * should pass the reference's 32 (the smoke does). Note the seeded
    * init assumes roughly dense 0..n-1 ids — a sparse id space thins
    * the initial graph (convergence recovers it, but slower). */
  case class Params(k: Int = 10, maxIterations: Int = 10,
      terminationThreshold: Double = 1e-3, seed: Long = 42,
      metric: Metric = Metric.L2, maxSamples: Int = 0)

  /** Edge list (src, dst, dist, rank) of the refined kNN graph. */
  def build(df: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val data = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .transform(graft.core.Frames.materialize(_))
    val n = data.count()

    // Cost-based route (LocalKernel): each refinement round is a self-join
    // + top-k + checkpoint job; on a collectable graph the rounds run in
    // memory, mirrored exactly (same xxhash64/pmod seeded init — replayed
    // via the catalyst XXH64 the expression compiles to — same 2-hop
    // candidate set, same distinct/merge, same (dist, id) top-k, same
    // update-rate termination, same final (dist, dst) rank window). r18:
    // the init previously ran as a distributed explode + two joins and was
    // collected anyway — building it off the already-collected vector map
    // removes those jobs from every local-route build.
    val sparkS = df.sparkSession
    if (LocalKernel.enabled(sparkS) && n <= LocalKernel.maxVectors(sparkS) &&
        n * params.k <= LocalKernel.maxEdges(sparkS)) {
      try return buildLocal(data, n, params)
      finally data.unpersist()
    }

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

    var graph = init.localCheckpoint()
    var it = 0
    var updateRate = 1.0
    while (it < params.maxIterations && updateRate > params.terminationThreshold) {
      // candidates: 2-hop neighbors (and reverse edges join both directions)
      val undAll = graph.select(col("src"), col("dst"))
        .unionByName(graph.select(col("dst").as("src"), col("src").as("dst")))
      // per-node hash sampling of the adjacency (see Params.maxSamples);
      // the same xxhash64 chain runs in buildLocal for route parity. The
      // distinct is required only here, where duplicate edges would eat
      // sample slots; the unsampled path dedups implicitly downstream.
      val und =
        if (params.maxSamples > 0)
          undAll.distinct()
            .withColumn("_h", xxhash64(col("src"), col("dst"), lit(params.seed + it)))
            .withColumn("_r", row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("src")).orderBy(col("_h"), col("dst"))))
            .filter(col("_r") <= params.maxSamples).drop("_h", "_r")
        else undAll
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
    val ord =
      if (Metric.isMinClose(params.metric)) Seq(col("dist").asc, col("dst").asc)
      else Seq(col("dist").desc, col("dst").asc)
    graph.withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(ord: _*)))
  }

  /** In-memory twin of the refinement loop (see build). */
  private def buildLocal(data: DataFrame, n: Long,
      params: Params): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val vecs = new java.util.HashMap[Long, Array[Float]]()
    data.as[(Long, Array[Float])].collect().foreach { case (i, v) => vecs.put(i, v) }
    val distFn = graft.core.Distance.fn(params.metric)
    val minClose = Metric.isMinClose(params.metric)

    // seeded init, replayed off the collected vector map: catalyst's
    // xxhash64(src: long, j: int, seed: long) folds left from seed 42
    // hashing each child by its physical type; pmod is ((h % n) + n) % n.
    // Edges whose drawn dst is absent from the id space drop out exactly
    // as the distributed init's inner join drops them.
    var graph: Map[Long, Array[(Long, Double)]] = {
      import org.apache.spark.sql.catalyst.expressions.XXH64
      val ids = vecs.keySet().toArray(new Array[java.lang.Long](0)).map(_.longValue())
      ids.iterator.map { src =>
        val sv = vecs.get(src)
        val es = (1 to params.k).iterator.flatMap { j =>
          var h = XXH64.hashLong(src, 42L)
          h = XXH64.hashInt(j, h)
          h = XXH64.hashLong(params.seed, h)
          val dst = ((h % n) + n) % n
          val dv = vecs.get(dst)
          if (dst != src && dv != null) Iterator.single((dst, distFn(sv, dv)))
          else Iterator.empty
        }.toArray
        src -> es
      }.filter(_._2.nonEmpty).toMap
    }

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
      // per-node hash sampling — the exact xxhash64(src, dst, seed+it)
      // chain the distributed route's window computes (same signed-long
      // (hash, dst) order, same distinct-first semantics)
      val sampledU = new java.util.HashMap[Long, Array[Long]]()
      locally {
        import org.apache.spark.sql.catalyst.expressions.XXH64
        val seedIt = params.seed + it
        und.forEach { (s, nbrs) =>
          val arr = nbrs.toArray.distinct
          sampledU.put(s,
            if (params.maxSamples <= 0 || arr.length <= params.maxSamples) arr
            else arr.map { d =>
              var h = XXH64.hashLong(s, 42L)
              h = XXH64.hashLong(d, h)
              (XXH64.hashLong(seedIt, h), d)
            }.sortBy(identity).take(params.maxSamples).map(_._2))
        }
      }
      // merged top-k per node over current edges + distinct 2-hop candidates
      val next = scala.collection.mutable.Map.empty[Long, Array[(Long, Double)]]
      sampledU.forEach { (s, n1) =>
        val cand = new java.util.HashSet[Long]()
        graph.get(s).foreach(_.foreach(e => cand.add(e._1)))
        n1.foreach { mid =>
          val two = sampledU.get(mid)
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
    val ordFinal: Ordering[(Long, Double)] =
      if (minClose) Ordering.by(e => (e._2, e._1))
      else Ordering.by((e: (Long, Double)) => (-e._2, e._1))
    val rows = graph.toSeq.flatMap { case (s, es) =>
      es.sorted(ordFinal).zipWithIndex.map { case ((d, dist), i) =>
        (s, d, dist, i + 1)
      }
    }
    spark.createDataFrame(rows).toDF("src", "dst", "dist", "rank")
  }
}
