package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.{Distance, Metric}

/** Vamana (DiskANN) graph build — `cuvs::neighbors::vamana`
  * (vamana.hpp:59-82: graph_degree R=32, visited_size L=64, alpha=1.2).
  *
  * Spark shape (batch, not per-vector insertion): the candidate pool for
  * every node is its exact/approximate L-NN list — the batch analog of the
  * reference's greedy-search visited list — followed by the *robust prune*
  * (alpha-RNG rule: drop candidate c if an already-kept neighbor w has
  * alpha·d(w,c) <= d(p,c)), then reverse-edge augmentation and a second
  * prune to re-cap the degree, exactly the reference's insert round
  * structure (vamana.hpp:66: "each iteration inserts all vectors").
  *
  * The prune is a per-node local computation over <= L candidates: a
  * groupByKey/flatMapGroups whose state is L·dim floats — never a shuffle
  * of anything larger than the candidate edge list. At 100 TB the
  * candidate stage comes from AllNeighbors (cell-bounded) instead of the
  * exact self-join; the prune stage is unchanged.
  */
object Vamana {

  case class Params(graphDegree: Int = 32, visitedSize: Int = 64, alpha: Double = 1.2,
      metric: Metric = Metric.L2Sqrt)

  /** Robust-pruned edge list (src, dst, dist, rank).
    *
    * `candidates` (src, dst, dist) overrides the per-node candidate pool —
    * at scale pass an [[AllNeighbors.build]] graph (cell-bounded) instead
    * of letting this default to the exact L-NN self-join. */
  def build(df: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec",
      candidates: Option[DataFrame] = None): DataFrame = {
    val sel = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    // Cost-based route (LocalKernel): the default-pool build is exact-kNN
    // (a full self-join pass) + two per-node prunes + a reverse-edge
    // aggregation — ~20 jobs whose per-job scheduling dwarfs the compute on
    // a collectable table (r18: 2.6 s wall, 1.0 scaling ratio 8c→32c). The
    // local kernel broadcasts the vectors once, fuses the exact L-NN pool
    // and the first prune into ONE parallel pass over node ranges (same
    // TopKBuf (dist, id) order as the knnJoin plan, so the pool is
    // identical), and runs the reverse augment + re-prune on the collected
    // |V|·degree edge list. Output is row-identical to the join route —
    // GraphSuite pins the equivalence. Above the gate (or with an explicit
    // candidate pool) the distributed plan below runs unchanged.
    val sparkL = df.sparkSession
    if (candidates.isEmpty && LocalKernel.enabled(sparkL) &&
        LocalKernel.within(sel, LocalKernel.maxVectors(sparkL)))
      return buildLocal(sel, params)
    val data = sel.transform(graft.core.Frames.materialize(_))
    val cand = candidates
      .getOrElse(AllNeighbors.exact(data, params.visitedSize, params.metric, "id", "vec"))
      .select(col("src"), col("dst"), col("dist"))
    val pruned = robustPrune(cand, data, params)
    // reverse-edge augmentation, then re-cap the degree with a second prune
    val augmented = pruned
      .select(col("src"), col("dst"), col("dist"))
      .unionByName(pruned.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
      .groupBy(col("src"), col("dst")).agg(min(col("dist")).as("dist"))
    val out = robustPrune(augmented, data, params)
    data.unpersist()
    out
  }

  /** Greedy alpha-RNG prune of one node's candidate pool (sorted best
    * first); shared by both robustPrune routes and the fused buildLocal. */
  private def pruneGroup(src: Long, cand: Array[(Long, Double, Array[Float])],
      degree: Int, alpha: Double,
      distFn: (Array[Float], Array[Float]) => Double): Iterator[(Long, Long, Double, Int)] = {
    val removed = new Array[Boolean](cand.length)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    var i = 0
    while (i < cand.length && kept.length < degree) {
      if (!removed(i)) {
        val (dst, dist, dvec) = cand(i)
        kept += ((dst, dist))
        var j = i + 1
        while (j < cand.length) {
          if (!removed(j) && alpha * distFn(dvec, cand(j)._3) <= cand(j)._2)
            removed(j) = true
          j += 1
        }
      }
      i += 1
    }
    kept.iterator.zipWithIndex.map { case ((dst, dist), rk) => (src, dst, dist, rk + 1) }
  }

  /** Single-collect fused build (see build doc): exact L-NN pool + first
    * prune in one parallel pass over node ranges against the broadcast
    * vector table, then reverse augment + re-prune over the collected
    * pruned edge list (|V|·degree rows). Row-identical to the join route. */
  private def buildLocal(sel: DataFrame, params: Params): DataFrame = {
    val spark = sel.sparkSession
    import spark.implicits._
    val rows: Array[(Long, Array[Float])] =
      sel.as[(Long, Array[Float])].collect().sortBy(_._1)
    val n = rows.length
    val distFn = Distance.fn(params.metric)
    val l2Fast = params.metric == Metric.L2 || params.metric == Metric.L2Sqrt
    val sqrtOut = params.metric == Metric.L2Sqrt
    val minClose = Metric.isMinClose(params.metric)
    val lSize = params.visitedSize
    val (degree, alpha) = (params.graphDegree, params.alpha)
    val bc = spark.sparkContext.broadcast(rows)
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism, math.max(1, n)))
    // stage 1 (parallel): per node, exact top-L pool over the broadcast
    // table (TopKBuf's (dist, id) total order = the knnJoin ranking, self
    // excluded) fused with the first robust prune
    val pruned: Array[(Long, Long, Double, Int)] =
      if (n == 0) Array.empty
      else spark.range(0, n, 1, parts).as[Long].mapPartitions { it =>
        val all = bc.value
        val byId = new java.util.HashMap[Long, Array[Float]](all.length * 2)
        all.foreach { case (id, v) => byId.put(id, v) }
        it.flatMap { iL =>
          val i = iL.toInt
          val (id, vec) = all(i)
          val buf = graft.core.TopKBuf(lSize, minClose,
            new Array[Double](lSize), new Array[Long](lSize), 0)
          var j = 0
          while (j < all.length) {
            if (j != i) {
              if (l2Fast) {
                val raw = buf.bound
                val bnd =
                  if (sqrtOut && !raw.isInfinity) Math.nextUp(Math.nextUp(raw * raw)) else raw
                val s = graft.core.Distance.l2UpTo(vec, all(j)._2, bnd)
                if (s <= bnd) buf.insert(if (sqrtOut) math.sqrt(s) else s, all(j)._1)
              } else buf.insert(distFn(vec, all(j)._2), all(j)._1)
            }
            j += 1
          }
          // buf's arrays are in heap order (root = worst); pruneGroup needs
          // the robustPrune candidate order — (dist, id) ascending, exactly
          // the join route's sortBy((t._3, t._2))
          val cand = buf.result().toArray
            .map(nb => (nb.id, nb.dist, byId.get(nb.id)))
            .sortBy(t => (t._2, t._1))
          pruneGroup(id, cand, degree, alpha, distFn)
        }
      }.collect()
    bc.destroy()
    // stage 2 (driver, |V|·degree edges): reverse augment, min-dist dedup,
    // re-prune per node — same (dist, dst) candidate order as robustPrune
    val byId = new java.util.HashMap[Long, Array[Float]](rows.length * 2)
    rows.foreach { case (id, v) => byId.put(id, v) }
    val merged = new java.util.HashMap[Long, java.util.HashMap[Long, java.lang.Double]]()
    def add(s: Long, d: Long, w: Double): Unit = {
      var m = merged.get(s)
      if (m == null) { m = new java.util.HashMap[Long, java.lang.Double](); merged.put(s, m) }
      val prev = m.get(d)
      if (prev == null || w < prev.doubleValue()) m.put(d, w)
    }
    pruned.foreach { case (s, d, w, _) => add(s, d, w); add(d, s, w) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    merged.forEach { (s, m) =>
      val cand = new Array[(Long, Double, Array[Float])](m.size)
      var i = 0
      m.forEach { (d, w) => cand(i) = (d, w, byId.get(d)); i += 1 }
      java.util.Arrays.sort(cand, Ordering.by((t: (Long, Double, Array[Float])) => (t._2, t._1)))
      out ++= pruneGroup(s, cand, degree, alpha, distFn)
    }
    spark.createDataFrame(out.toSeq).toDF("src", "dst", "dist", "rank")
  }

  /** Greedy alpha-RNG prune per source node (DiskANN RobustPrune).
    *
    * Cost-based route (graft.graphops.LocalKernel): when the vector table
    * fits under the broadcast threshold, ship it once as a map and shuffle
    * only the bare (src, dst, dist) edges into the per-node groups —
    * instead of joining a dim-wide vector onto every candidate edge and
    * shuffling visited_size·dim floats per node. Above the threshold the
    * join route runs unchanged (the at-scale plan).
    */
  private[graphops] def robustPrune(edges: DataFrame, data: DataFrame,
      params: Params): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val distFn = Distance.fn(params.metric)
    val (degree, alpha) = (params.graphDegree, params.alpha)

    if (LocalKernel.enabled(spark) &&
        LocalKernel.within(data, LocalKernel.maxVectors(spark))) {
      val vecs = new java.util.HashMap[Long, Array[Float]]()
      data.select(col("id").cast("long"), col("vec"))
        .as[(Long, Array[Float])].collect().foreach { case (i, v) => vecs.put(i, v) }
      val bcVecs = spark.sparkContext.broadcast(vecs)
      edges.select(col("src").cast("long"), col("dst").cast("long"), col("dist").cast("double"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (src, it) =>
          val vs = bcVecs.value
          val cand = it.toArray.sortBy(t => (t._3, t._2)).map(t => (t._2, t._3, vs.get(t._2)))
          pruneGroup(src, cand, degree, alpha, distFn)
        }
        .toDF("src", "dst", "dist", "rank")
    } else {
      edges
        .join(data.select(col("id").as("dst"), col("vec").as("dvec")), "dst")
        .select(col("src"), col("dst"), col("dist"), col("dvec"))
        .as[(Long, Long, Double, Array[Float])]
        .groupByKey(_._1)
        .flatMapGroups { (src, it) =>
          val cand = it.toArray.sortBy(t => (t._3, t._2)).map(t => (t._2, t._3, t._4))
          pruneGroup(src, cand, degree, alpha, distFn)
        }
        .toDF("src", "dst", "dist", "rank")
    }
  }
}
