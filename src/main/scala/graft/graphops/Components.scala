package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components + single-linkage clustering over edge lists —
  * the flat-cluster side of `cuvs::cluster::agglomerative`
  * (agglomerative.hpp:107 single_linkage, :191-222 build_linkage; the
  * reference also builds the dendrogram "on the host", :251 — validating
  * the driver-side union-find here).
  */
object Components {

  /** Min-label propagation connected components: (id, component) where
    * component = smallest reachable id. Iterative join with
    * localCheckpoint per round (SURVEY.md §7.4 hard part 1); rounds =
    * O(graph diameter) — for near-dup clusters (tiny components) this is
    * 2-3 rounds regardless of data size. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      idCol: String = "id", srcCol: String = "src", dstCol: String = "dst",
      maxIterations: Int = 20): DataFrame = {
    // Cost-based route (LocalKernel): min-label propagation converges to
    // component = smallest reachable id; on a collectable edge list a
    // driver-side union-find (roots pinned to the minimum id) produces the
    // same fixpoint in one pass instead of O(diameter) join rounds.
    val sparkL = vertices.sparkSession
    if (LocalKernel.enabled(sparkL)) {
      val vs = vertices.select(col(idCol).cast("long").as("id"))
      val es = edges.select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      if (LocalKernel.within(vs, LocalKernel.maxVectors(sparkL)) &&
          LocalKernel.within(es, LocalKernel.maxEdges(sparkL))) {
        val ids = vs.collect().map(_.getLong(0))
        val parent = scala.collection.mutable.Map(ids.map(v => v -> v): _*)
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
          r
        }
        es.collect().foreach { r =>
          val (x, y) = (r.getLong(0), r.getLong(1))
          // edges touching unknown ids are ignored, as the join route does
          if (parent.contains(x) && parent.contains(y)) {
            val (a, b) = (find(x), find(y))
            if (a != b) parent(math.max(a, b)) = math.min(a, b)
          }
        }
        return sparkL.createDataFrame(ids.toSeq.map(v => (v, find(v))))
          .toDF("id", "component")
      }
    }

    val und = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionByName(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .distinct().localCheckpoint()
    var labels = vertices.select(col(idCol).cast("long").as("id"))
      .withColumn("component", col("id")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIterations) {
      val nbrMin = und.join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id")).agg(min(col("component")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.component") =!= col("o.component")).count()
      // the superseded round's checkpoint blocks are dead once `next` is
      // materialized and the change count read — free them, or a
      // long-lived session accumulates one O(n) cached frame per round
      graft.core.Frames.releaseCheckpoint(labels)
      labels = next
      it += 1
    }
    graft.core.Frames.releaseCheckpoint(und)
    // the returned frame stays checkpointed (callers iterate over it);
    // release it with Frames.releaseCheckpoint when done
    labels
  }

  /** Distributed Borůvka MST: every component proposes its minimum
    * outgoing edge per round; proposals (≤ #components, shrinking
    * geometrically) collect to the driver where union-find merges them —
    * the reference's host-side dendrogram build, distributed edge scan.
    * Per-vertex labels stay distributed: the driver never collects the
    * vertex set (its union-find populates lazily from proposal endpoints,
    * i.e. at the dendrogram's own output scale) and per round ships back
    * only the merged-roots remap (≤ 2·#merges rows, broadcast), never an
    * O(n) id→component frame. Returns MST edges (src, dst, dist).
    *
    * DOCUMENTED DRIVER LIMIT: the dendrogram itself is O(n) driver state —
    * the returned n−1 MST edges plus the union-find the merges populate
    * (~150–300 B/vertex measured; ScaleSmoke's `linkage` phase asserts the
    * bound and prints the constant). This is parity with the reference,
    * whose dendrogram build is likewise host-side
    * (agglomerative.hpp:251 "build the dendrogram on the host"), and is
    * inherent to the OUTPUT (a driver-resident merge tree), not to the
    * scan: edges stay distributed, per-round collects are ≤ #components.
    * At 100 TB, callers that only need LABELS at a cut (not the tree)
    * should cap the collected structure by pre-contracting with
    * connectedComponents at the cut threshold — the
    * CagraOptimize.optimizeConnected / boruvkaMstContracted route, whose
    * driver state is O(#components). */
  def boruvkaMst(vertices: DataFrame, edges: DataFrame,
      idCol: String = "id", maxRounds: Int = 20): Seq[(Long, Long, Double)] = {
    // Cost-based route (LocalKernel): the per-round work is a per-component
    // min-edge pick — on a collectable edge list the same rounds run in
    // memory (same (dist, src, dst) proposal ordering, same union order),
    // producing the identical MST edge sequence without per-round jobs.
    val sparkL = vertices.sparkSession
    if (LocalKernel.enabled(sparkL)) {
      val eCheap = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("dist").cast("double"))
      if (LocalKernel.within(eCheap, LocalKernel.maxEdges(sparkL))) {
        val vs = vertices.select(col(idCol).cast("long").as("id")).collect().map(_.getLong(0))
        val parent = scala.collection.mutable.Map(vs.map(v => v -> v): _*)
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
          r
        }
        val all = eCheap.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .filter(t => parent.contains(t._1) && parent.contains(t._2))
        val mstL = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var rounds = 0
        var merged = 1
        while (merged > 0 && rounds < maxRounds) {
          val best = scala.collection.mutable.Map.empty[Long, (Long, Long, Double)]
          all.foreach { case t @ (s, d, w) =>
            val cs = find(s)
            if (cs != find(d)) {
              val cur = best.get(cs)
              if (cur.isEmpty || {
                    val (s0, d0, w0) = cur.get
                    w < w0 || (w == w0 && (s < s0 || (s == s0 && d < d0)))
                  }) best(cs) = t
            }
          }
          merged = 0
          best.values.toSeq.sortBy(t => (t._3, t._1, t._2)).foreach { case (s, d, w) =>
            val (a, b) = (find(s), find(d))
            if (a != b) {
              parent(math.max(a, b)) = math.min(a, b)
              mstL += ((s, d, w))
              merged += 1
            }
          }
          rounds += 1
        }
        return mstL.toSeq
      }
    }

    // Distributed route: `labels` (id → current root) lives in a DataFrame
    // and is advanced per round by a broadcast join with just the roots
    // that merged — equivalent to the driver-side find() relabel because
    // the remap is emitted fully path-compressed after the round's unions.
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("dist").cast("double").as("dist"))
      .localCheckpoint()
    var labels = vertices.select(col(idCol).cast("long").as("id"))
      .withColumn("comp", col("id")).localCheckpoint()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val mst = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var rounds = 0
    var merged = 1
    while (merged > 0 && rounds < maxRounds) {
      // inner joins also drop edges touching ids outside `vertices`, as the
      // old per-round comp-map join did
      val prop = e
        .join(labels.select(col("id").as("src"), col("comp").as("csrc")), "src")
        .join(labels.select(col("id").as("dst"), col("comp").as("cdst")), "dst")
        .filter(col("csrc") =!= col("cdst"))
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("csrc"))
          .orderBy(col("dist").asc, col("src").asc, col("dst").asc)))
        .filter(col("rk") === 1)
        .select(col("src"), col("dst"), col("dist")).collect()
      merged = 0
      val touched = scala.collection.mutable.Set.empty[Long]
      prop.sortBy(r => (r.getDouble(2), r.getLong(0), r.getLong(1))).foreach { r =>
        val (s, d) = (find(r.getLong(0)), find(r.getLong(1)))
        if (s != d) {
          parent(math.max(s, d)) = math.min(s, d)
          touched += s; touched += d
          mst += ((r.getLong(0), r.getLong(1), r.getDouble(2)))
          merged += 1
        }
      }
      if (merged > 0) {
        val remap = touched.toSeq.map(c => (c, find(c))).filter(t => t._1 != t._2)
        val remapDf = broadcast(e.sparkSession.createDataFrame(remap).toDF("comp", "newComp"))
        val next = labels.join(remapDf, Seq("comp"), "left")
          .select(col("id"), coalesce(col("newComp"), col("comp")).as("comp"))
          .localCheckpoint()
        // eager checkpoint: `next` is materialized, so the previous
        // round's blocks are dead — free them instead of accumulating one
        // O(n) cached frame per merging round
        graft.core.Frames.releaseCheckpoint(labels)
        labels = next
      }
      rounds += 1
    }
    graft.core.Frames.releaseCheckpoint(labels)
    graft.core.Frames.releaseCheckpoint(e)
    mst.toSeq
  }

  /** Borůvka MST over a pre-contracted multigraph: `edges` is
    * (src, dst, dist, csrc, cdst) with csrc/cdst the component labels of
    * the endpoints under some vertex partition, pre-filtered to
    * csrc != cdst. Union-find runs over the LABELS — driver state is
    * O(#components), never O(#vertices) — and returned edges carry the
    * ORIGINAL endpoints. Per round, each super-component's minimum
    * outgoing edge is picked distributed ((dist, src, dst) ordering, same
    * as boruvkaMst) and only those ≤ #components proposals collect. This
    * is the bridge-selection step of CagraOptimize.optimizeConnected. */
  def boruvkaMstContracted(edges: DataFrame, maxRounds: Int = 20): Seq[(Long, Long, Double)] = {
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
      col("dist").cast("double").as("dist"),
      col("csrc").cast("long").as("csrc"), col("cdst").cast("long").as("cdst"))
      .localCheckpoint()
    val comps = e.select(col("csrc").as("c")).unionByName(e.select(col("cdst").as("c")))
      .distinct().collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(comps.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    val mst = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var rounds = 0
    var merged = 1
    while (merged > 0 && rounds < maxRounds) {
      val m = parent.keys.map(v => v -> find(v)).toSeq
      val mDf = broadcast(spark.createDataFrame(m).toDF("c", "sc"))
      val prop = e
        .join(mDf.select(col("c").as("csrc"), col("sc").as("_s1")), "csrc")
        .join(mDf.select(col("c").as("cdst"), col("sc").as("_s2")), "cdst")
        .filter(col("_s1") =!= col("_s2"))
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("_s1"))
          .orderBy(col("dist").asc, col("src").asc, col("dst").asc)))
        .filter(col("rk") === 1)
        .select(col("src"), col("dst"), col("dist"), col("_s1"), col("_s2")).collect()
      merged = 0
      prop.sortBy(r => (r.getDouble(2), r.getLong(0), r.getLong(1))).foreach { r =>
        val (a, b) = (find(r.getLong(3)), find(r.getLong(4)))
        if (a != b) {
          parent(math.max(a, b)) = math.min(a, b)
          mst += ((r.getLong(0), r.getLong(1), r.getDouble(2)))
          merged += 1
        }
      }
      rounds += 1
    }
    graft.core.Frames.releaseCheckpoint(e)
    mst.toSeq
  }

  /** Single-linkage flat labels at `nClusters`: cut the MST at its
    * nClusters-1 largest edges (single_linkage semantics). Returns
    * (id, cluster) with clusters = smallest member id. */
  def singleLinkageLabels(vertices: DataFrame, edges: DataFrame, nClusters: Int,
      idCol: String = "id"): DataFrame = {
    val mst = boruvkaMst(vertices, edges, idCol)
    val keep = mst.sortBy(_._3).dropRight(math.min(nClusters - 1, mst.size))
    labelsFromKeptEdges(vertices, keep, idCol)
  }

  /** Single-linkage flat labels at a distance `threshold`: keep MST edges
    * with dist < threshold. By the MST cut property this equals connected
    * components of the input graph restricted to edges < threshold — which
    * makes it exactly oracle-able in SQL (and a genuine correctness check
    * of the distributed Borůvka MST itself). */
  def singleLinkageCut(vertices: DataFrame, edges: DataFrame, threshold: Double,
      idCol: String = "id"): DataFrame = {
    val mst = boruvkaMst(vertices, edges, idCol)
    labelsFromKeptEdges(vertices, mst.filter(_._3 < threshold), idCol)
  }

  /** Mutual-reachability re-weighting of a kNN edge list — the HDBSCAN
    * distance of `cuvs::cluster::agglomerative`
    * (agglomerative.hpp:121-151 mutual_reachability_params;
    * detail/reachability.cuh): core_minPts(x) = distance to x's minPts-th
    * nearest other point, MR(a,b) = max(core(a), core(b), d(a,b)).
    * `knn` must be a self-exclusive (src, dst, dist, rank) graph with
    * k >= minPts. Two equi-joins against the O(n) core table — the core
    * side re-uses the kNN graph's own rank column, no extra distance pass;
    * at scale both joins shuffle on the id key the graph is already
    * grouped by. */
  def mutualReachability(knn: DataFrame, minPts: Int): DataFrame = {
    val core = knn.filter(col("rank") === minPts)
      .select(col("src").as("_cid"), col("dist").as("_core"))
    knn.select(col("src"), col("dst"), col("dist"))
      .join(core.select(col("_cid").as("src"), col("_core").as("_ca")), "src")
      .join(core.select(col("_cid").as("dst"), col("_core").as("_cb")), "dst")
      .select(col("src"), col("dst"),
        greatest(col("dist"), col("_ca"), col("_cb")).as("dist"))
  }

  /** Single-linkage cut over mutual-reachability weights — HDBSCAN's flat
    * extraction at a fixed lambda. Same MST cut property as
    * singleLinkageCut, so equally oracle-able as connected components of
    * the MR-thresholded graph. */
  def mutualReachabilityCut(vertices: DataFrame, knn: DataFrame, minPts: Int,
      threshold: Double, idCol: String = "id"): DataFrame =
    singleLinkageCut(vertices, mutualReachability(knn, minPts), threshold, idCol)

  private def labelsFromKeptEdges(vertices: DataFrame, keep: Seq[(Long, Long, Double)],
      idCol: String): DataFrame = {
    val spark = vertices.sparkSession
    val keepDf =
      if (keep.isEmpty)
        spark.createDataFrame(Seq.empty[(Long, Long, Double)]).toDF("src", "dst", "dist")
      else spark.createDataFrame(keep).toDF("src", "dst", "dist")
    connectedComponents(vertices, keepDf, idCol)
      .withColumnRenamed("component", "cluster")
  }
}
