package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CAGRA graph optimization — the detour-counting prune + reverse-edge
  * augmentation of `cagra::optimize` (graph_core.cuh:206 kern_fused_prune,
  * detour counting :259-306; cagra.hpp:149-224: intermediate degree 128 ->
  * graph_degree 64).
  *
  * An edge (s,d) is "detourable" when a 2-hop path s->v->d exists whose
  * BOTH hops rank better (smaller dist) than (s,d) itself — such edges are
  * redundant for greedy search. Keep the `degree` least-detourable edges
  * per node, then add reverse edges to rebalance in-degree, capped at
  * `degree` per node again.
  *
  * Relational shape: one triangle join (edges x edges on the shared middle
  * node, joined back to the pruned edge) + two per-node top-k windows.
  */
object CagraOptimize {

  /** graph: (src, dst, dist); returns (src, dst, dist, rank) with
    * <= degree edges per src. */
  def optimize(graph: DataFrame, degree: Int): DataFrame = {
    val e = graph.select(col("src"), col("dst"), col("dist"))
    // Cost-based route (LocalKernel): the detour count is a triangle join
    // (two shuffles) + two ranked windows + a reverse-edge aggregate —
    // ~10 jobs. On a collectable edge list (|V|·k rows, NOT the vector
    // table) the same counting runs in memory off one collect: per edge
    // (s,d), scan s's out-list and probe (v,d) in a hash index — identical
    // counts, identical (detours, dist, dst) pruning order, identical
    // reverse-augment min-dist dedup. Row-identical output (the
    // cagra_optimize oracle hash-pins it); the join route below is the
    // at-scale plan.
    val sparkL = graph.sparkSession
    if (LocalKernel.enabled(sparkL) &&
        LocalKernel.within(e, LocalKernel.maxEdges(sparkL)))
      return optimizeLocal(e, degree)
    // detours: s->v (d1) and v->d (d2), both shorter than s->d
    val detours = e.as("sd")
      .join(e.as("sv"), col("sd.src") === col("sv.src"))
      .join(e.as("vd"), col("sv.dst") === col("vd.src") && col("vd.dst") === col("sd.dst"))
      .filter(col("sv.dist") < col("sd.dist") && col("vd.dist") < col("sd.dist"))
      .groupBy(col("sd.src").as("src"), col("sd.dst").as("dst"))
      .agg(count(lit(1)).as("detours"))
    val scored = e.join(detours, Seq("src", "dst"), "left")
      .withColumn("detours", coalesce(col("detours"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(col("detours").asc, col("dist").asc, col("dst").asc)
    val pruned = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= degree)
      .select(col("src"), col("dst"), col("dist"))
    // reverse-edge augmentation, then cap per-node degree again
    val augmented = pruned
      .unionByName(pruned.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
      .groupBy(col("src"), col("dst")).agg(min(col("dist")).as("dist"))
    val w2 = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(col("dist").asc, col("dst").asc)
    augmented.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= degree)
  }

  /** In-memory core of the local route: detour-count prune + reverse
    * augment + degree cap over a collected edge list. Returns the per-src
    * kept lists sorted by (dist, dst) — rank is index+1. */
  private def pruneLocal(edges: Array[(Long, Long, Double)],
      degree: Int): java.util.HashMap[Long, Array[(Double, Long)]] = {
    // out-adjacency + (src, dst) -> dist probe index
    val out = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[(Long, Double)]]()
    val byPair = new java.util.HashMap[(Long, Long), java.lang.Double](edges.length * 2)
    edges.foreach { case (s, d, w) =>
      var b = out.get(s)
      if (b == null) { b = scala.collection.mutable.ArrayBuffer.empty; out.put(s, b) }
      b += ((d, w))
      byPair.put((s, d), w)
    }
    // detours of (s,d): middle nodes v with d(s,v) < d(s,d) and d(v,d) < d(s,d)
    def detoursOf(s: Long, d: Long, w: Double): Long = {
      val nbrs = out.get(s)
      var c = 0L
      var i = 0
      while (i < nbrs.length) {
        val (v, d1) = nbrs(i)
        if (d1 < w) {
          val d2 = byPair.get((v, d))
          if (d2 != null && d2.doubleValue() < w) c += 1
        }
        i += 1
      }
      c
    }
    // prune: keep the `degree` least-detourable per src ((detours, dist, dst))
    val bySrc = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]]()
    edges.foreach { case t @ (s, _, _) =>
      var b = bySrc.get(s)
      if (b == null) { b = scala.collection.mutable.ArrayBuffer.empty; bySrc.put(s, b) }
      b += t
    }
    val augmented = new java.util.HashMap[Long, java.util.HashMap[Long, java.lang.Double]]()
    def add(s: Long, d: Long, w: Double): Unit = {
      var m = augmented.get(s)
      if (m == null) { m = new java.util.HashMap[Long, java.lang.Double](); augmented.put(s, m) }
      val prev = m.get(d)
      if (prev == null || w < prev.doubleValue()) m.put(d, w)
    }
    bySrc.forEach { (s, b) =>
      val scored = b.map { case (_, d, w) => (detoursOf(s, d, w), w, d) }.toArray
      java.util.Arrays.sort(scored,
        Ordering.by((t: (Long, Double, Long)) => t))
      val keep = math.min(degree, scored.length)
      var i = 0
      while (i < keep) {
        val (_, w, d) = scored(i)
        add(s, d, w); add(d, s, w)
        i += 1
      }
    }
    // cap per-node degree again, rank by (dist, dst)
    val res = new java.util.HashMap[Long, Array[(Double, Long)]](augmented.size() * 2)
    augmented.forEach { (s, m) =>
      val arr = new Array[(Double, Long)](m.size)
      var i = 0
      m.forEach { (d, w) => arr(i) = (w, d); i += 1 }
      java.util.Arrays.sort(arr, Ordering.by((t: (Double, Long)) => t))
      res.put(s, arr.take(math.min(degree, arr.length)))
    }
    res
  }

  private def collectEdges(e: DataFrame): Array[(Long, Long, Double)] = {
    val spark = e.sparkSession
    import spark.implicits._
    e.select(col("src").cast("long"), col("dst").cast("long"), col("dist").cast("double"))
      .as[(Long, Long, Double)].collect()
  }

  /** In-memory twin of the optimize plan (see optimize doc). */
  private def optimizeLocal(e: DataFrame, degree: Int): DataFrame = {
    val spark = e.sparkSession
    val capped = pruneLocal(collectEdges(e), degree)
    val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    capped.forEach { (s, arr) =>
      var i = 0
      while (i < arr.length) { res += ((s, arr(i)._2, arr(i)._1, i + 1)); i += 1 }
    }
    spark.createDataFrame(res.toSeq).toDF("src", "dst", "dist", "rank")
  }

  /** `optimize` with the connectivity guarantee (cagra.hpp:369-380,
    * `guarantee_connectivity` — "MST optimization ensures all vertices
    * stay reachable"): after the detour prune, any input-graph components
    * the prune split apart are re-bridged with MST edges of the ORIGINAL
    * graph (Borůvka, §2.4 machinery), so the result is exactly as
    * connected as the input. Bridge edges are appended in both directions
    * and may exceed `degree` for their endpoints — connectivity trumps the
    * cap, as in the reference. Consequently the returned `rank` column is
    * UNCAPPED (unlike `optimize`, whose output is filtered to
    * rank <= degree): it is the per-src ordering only, and bridge
    * endpoints can carry rank > degree. Labels stay DISTRIBUTED — bridge
    * candidates are selected by joining the edge list against the
    * component labels, and the only driver state is the O(#components)
    * union-find of the contracted Borůvka (at 1B nodes a per-vertex label
    * collect would OOM the driver; #components is tiny).
    */
  def optimizeConnected(graph: DataFrame, degree: Int): DataFrame = {
    // Cost-based route (LocalKernel): the distributed form below pays the
    // prune (local-kernel'd already), a checkpoint, an iterative
    // connected-components, a distinct count, and — when components split —
    // a per-round contracted Borůvka with a collect per round: ~25 jobs.
    // On a collectable edge list the whole pipeline runs in memory off one
    // collect: same detour prune, a min-id union-find (= the min-label
    // propagation fixpoint), the same per-super-component (dist, src, dst)
    // bridge proposals applied in the same order, the same min-dist dedup
    // and UNCAPPED (dist, dst) rank. Row-identical output (LocalKernelSuite
    // pins it); the distributed plan below is the at-scale path.
    val eIn = graph.select(col("src"), col("dst"), col("dist"))
    val sparkG = graph.sparkSession
    if (LocalKernel.enabled(sparkG) &&
        LocalKernel.within(eIn, LocalKernel.maxEdges(sparkG)))
      return optimizeConnectedLocal(eIn, degree)
    val pruned = optimize(graph, degree).select(col("src"), col("dst"), col("dist"))
      .localCheckpoint()
    val verts = graph.select(col("src").as("id"))
      .unionByName(graph.select(col("dst").as("id"))).distinct()
    val labels = Components.connectedComponents(verts, pruned).localCheckpoint()
    val nComp = labels.select(col("component")).distinct().count()
    val bridges: Seq[(Long, Long, Double)] =
      if (nComp <= 1) Seq.empty
      else {
        // contract the pruned components: only the original graph's
        // cross-component edges are bridge candidates, tagged with their
        // endpoint labels via two distributed joins
        val cross = graph.select(col("src"), col("dst"), col("dist"))
          .join(labels.select(col("id").as("src"), col("component").as("csrc")), "src")
          .join(labels.select(col("id").as("dst"), col("component").as("cdst")), "dst")
          .filter(col("csrc") =!= col("cdst"))
        Components.boruvkaMstContracted(cross)
      }
    val spark = graph.sparkSession
    // dedup in BOTH branches so the two paths return the same shape even
    // if an upstream ever feeds duplicate (src, dst) rows
    val all = {
      val base =
        if (bridges.isEmpty) pruned
        else {
          import spark.implicits._
          val b = bridges.toDF("src", "dst", "dist")
          pruned.unionByName(b)
            .unionByName(b.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
        }
      base.groupBy(col("src"), col("dst")).agg(min(col("dist")).as("dist"))
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(col("dist").asc, col("dst").asc)
    all.withColumn("rank", row_number().over(w))
  }

  /** In-memory twin of optimizeConnected (see its doc): prune, min-id
    * union-find components, contracted-Borůvka bridges, min-dist dedup,
    * uncapped per-src (dist, dst) rank — all off one collect. */
  private def optimizeConnectedLocal(e: DataFrame, degree: Int): DataFrame = {
    val spark = e.sparkSession
    val edges = collectEdges(e)
    val capped = pruneLocal(edges, degree)
    // union-find over every vertex of the ORIGINAL graph, rooted at the
    // min id — find(v) equals the min-label-propagation component label
    val parent = new java.util.HashMap[Long, Long]()
    edges.foreach { case (s, d, _) =>
      parent.putIfAbsent(s, s); parent.putIfAbsent(d, d)
    }
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) { parent.put(r, parent.get(parent.get(r))); r = parent.get(r) }
      r
    }
    def union(x: Long, y: Long): Unit = {
      val (a, b) = (find(x), find(y))
      if (a != b) parent.put(math.max(a, b), math.min(a, b))
    }
    capped.forEach { (s, arr) => arr.foreach { case (_, d) => union(s, d) } }
    // component count after the prune
    val roots = new java.util.HashSet[Long]()
    parent.keySet().forEach(v => roots.add(find(v)))
    val bridges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    if (roots.size > 1) {
      // contracted Borůvka over the original graph's cross-component
      // edges — same proposal bucket (super-component of the SRC label),
      // same (dist, src, dst) pick and merge order as boruvkaMstContracted
      val cross = edges.map { case (s, d, w) => (s, d, w, find(s), find(d)) }
        .filter(t => t._4 != t._5)
      val parent2 = new java.util.HashMap[Long, Long]()
      cross.foreach { t => parent2.putIfAbsent(t._4, t._4); parent2.putIfAbsent(t._5, t._5) }
      def find2(x: Long): Long = {
        var r = x
        while (parent2.get(r) != r) { parent2.put(r, parent2.get(parent2.get(r))); r = parent2.get(r) }
        r
      }
      var rounds = 0
      var merged = 1
      while (merged > 0 && rounds < 20) {
        val best = new java.util.HashMap[Long, (Long, Long, Double, Long, Long)]()
        cross.foreach { case t @ (s, d, w, cs, cd) =>
          val a = find2(cs); val b = find2(cd)
          if (a != b) {
            val cur = best.get(a)
            if (cur == null || {
                  val (s0, d0, w0, _, _) = cur
                  w < w0 || (w == w0 && (s < s0 || (s == s0 && d < d0)))
                }) best.put(a, t)
          }
        }
        merged = 0
        val props = new Array[(Long, Long, Double, Long, Long)](best.size)
        var i = 0
        best.forEach { (_, t) => props(i) = t; i += 1 }
        java.util.Arrays.sort(props,
          Ordering.by((t: (Long, Long, Double, Long, Long)) => (t._3, t._1, t._2)))
        props.foreach { case (s, d, w, cs, cd) =>
          val (a, b) = (find2(cs), find2(cd))
          if (a != b) {
            parent2.put(math.max(a, b), math.min(a, b))
            bridges += ((s, d, w))
            merged += 1
          }
        }
        rounds += 1
      }
    }
    // pruned ∪ bridges ∪ reversed bridges, min-dist dedup per (src, dst)
    val all = new java.util.HashMap[Long, java.util.HashMap[Long, java.lang.Double]]()
    def add(s: Long, d: Long, w: Double): Unit = {
      var m = all.get(s)
      if (m == null) { m = new java.util.HashMap[Long, java.lang.Double](); all.put(s, m) }
      val prev = m.get(d)
      if (prev == null || w < prev.doubleValue()) m.put(d, w)
    }
    capped.forEach { (s, arr) => arr.foreach { case (w, d) => add(s, d, w) } }
    bridges.foreach { case (s, d, w) => add(s, d, w); add(d, s, w) }
    // UNCAPPED rank per src by (dist, dst) — bridge endpoints may exceed degree
    val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    all.forEach { (s, m) =>
      val arr = new Array[(Double, Long)](m.size)
      var i = 0
      m.forEach { (d, w) => arr(i) = (w, d); i += 1 }
      java.util.Arrays.sort(arr, Ordering.by((t: (Double, Long)) => t))
      i = 0
      while (i < arr.length) { res += ((s, arr(i)._2, arr(i)._1, i + 1)); i += 1 }
    }
    spark.createDataFrame(res.toSeq).toDF("src", "dst", "dist", "rank")
  }

  /** ACE (Augmented Core Extraction) partitioned/disk CAGRA build — the
    * reference's out-of-core build mode (cagra.hpp:40-100 `ace_params`:
    * npartitions / ef_construction / build_dir / use_disk;
    * cagra_build.cuh:100-193: balanced k-means over a sample, then each
    * vector labeled with its closest [core] and second-closest
    * [augmented] partition; :1123 `build_ace`).
    *
    * Spark-first mapping: the label/gather/sub-build machinery IS
    * AllNeighbors with overlapFactor = 2 and the balanced coarse trainer
    * — partitions are shuffle partitions, oversized partitions tile into
    * bounded block-pair tasks, and "fits in memory" is delegated to
    * Spark's native spill instead of hand-managed host/GPU buffers.
    * Where the reference keeps only the core rows of every sub-build
    * (ace_adjust_sub_graph_ids), the relational merge keeps each row's
    * top-k over BOTH its cells — the candidates are already materialized,
    * and the result dominates core-only extraction at equal degree. The
    * intermediate kNN graph and the final detour-pruned graph are
    * persisted under `buildDir` as parquet (the build_dir/use_disk
    * artifacts); the returned frame reads the on-disk graph, so the
    * build never re-runs downstream and the artifacts outlive the
    * session, as on the reference's disk path.
    *
    * `intermediateDegree` (0 = 2·degree) is the per-partition build
    * width — the knob ef_construction turns on the reference's
    * incremental sub-builds. */
  def buildAce(df: DataFrame, npartitions: Int, buildDir: String,
      degree: Int = 32, intermediateDegree: Int = 0,
      metric: graft.core.Metric = graft.core.Metric.L2,
      idCol: String = "id", vecCol: String = "vec",
      partitionRowBudget: Int = 25000): DataFrame = {
    require(npartitions >= 2, s"ACE needs >= 2 partitions, got $npartitions")
    require(partitionRowBudget > 0,
      s"partitionRowBudget must be positive, got $partitionRowBudget")
    val spark = df.sparkSession
    val kBuild = if (intermediateDegree > 0) intermediateDegree else 2 * degree
    // The reference sizes ACE partitions by a MEMORY budget, not a fixed
    // count (cagra.hpp:47-66: npartitions chosen so each partition fits
    // device memory) — per-partition build work stays bounded and the
    // total grows linearly with n. Mirror that: the caller's npartitions
    // is a floor, and the effective count rises so no cell exceeds
    // `partitionRowBudget` rows (the per-cell pair scan is quadratic in
    // cell size — ScaleSmoke measured 160 s at 200k/8 parts but 1076 s at
    // 500k/8 parts before this cap, ~400 s after). The input is
    // materialized first so the sizing count() doesn't evaluate an
    // expensive upstream pipeline a second time — this path exists for
    // exactly the out-of-core inputs where that matters.
    val input = graft.core.Frames.materialize(df)
    val effParts = math.max(npartitions,
      ((input.count() + partitionRowBudget - 1) / partitionRowBudget).toInt)
    val knn = AllNeighbors.build(input,
      AllNeighbors.Params(k = kBuild, nClusters = effParts,
        overlapFactor = 2, metric = metric, balanced = true),
      idCol, vecCol)
    val knnPath = s"$buildDir/knn_graph.parquet"
    knn.write.mode("overwrite").parquet(knnPath)
    graft.core.Frames.release(input)
    val opt = optimize(
      spark.read.parquet(knnPath).select(col("src"), col("dst"), col("dist")),
      degree)
    val optPath = s"$buildDir/optimized_graph.parquet"
    opt.write.mode("overwrite").parquet(optPath)
    spark.read.parquet(optPath)
  }
}
