package graft

import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.graphops.{AllNeighbors, CagraOptimize, Components, NnDescent, Spectral}

class GraphSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
  private lazy val small = emb.filter(col("vec_id") % 5 === 0)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("all_neighbors graph recall vs exact (overlap=2, 8 cells)") {
    val approx = AllNeighbors.build(emb,
      AllNeighbors.Params(k = 10, nClusters = 8, overlapFactor = 2, kmeansIters = 5),
      "vec_id", "embedding")
    val exact = AllNeighbors.exact(emb, 10, Metric.L2, "vec_id", "embedding")
    // floor tracks overlap_factor/n_clusters on heavily overlapping blobs
    // (reference scales min_recall with probe coverage the same way)
    val r = AllNeighbors.graphRecall(approx, exact)
    assert(r >= 0.65, s"graph recall $r")
    // every node present, degree exactly k
    assert(approx.groupBy(col("src")).count().filter(col("count") =!= 10).count() == 0)
  }

  test("all_neighbors block tiling: forced multi-block build == single-block build") {
    // blockRows=40 forces every ~100-row cell into 3+ hash blocks, driving
    // the off-diagonal bipartite tiles that fixture-sized cells never hit;
    // the edge list must be identical to the untiled build (TopKBuf's
    // total (dist, id) order makes the merge insertion-order-free)
    val params = AllNeighbors.Params(k = 5, nClusters = 4, overlapFactor = 2,
      kmeansIters = 5)
    val untiled = AllNeighbors.build(small, params, "id", "vec")
    spark.conf.set("spark.graft.allNeighbors.blockRows", "40")
    try {
      val tiled = AllNeighbors.build(small, params, "id", "vec")
      assert(tiled.count() == untiled.count())
      assert(tiled.except(untiled).count() == 0 && untiled.except(tiled).count() == 0)
    } finally spark.conf.unset("spark.graft.allNeighbors.blockRows")
  }

  test("nn_descent converges to high recall from a random graph") {
    val r = {
      val approx = NnDescent.build(small, NnDescent.Params(k = 8, maxIterations = 8), "id", "vec")
      val exact = AllNeighbors.exact(small, 8, Metric.L2, "id", "vec")
      AllNeighbors.graphRecall(approx, exact)
    }
    assert(r >= 0.75, s"nn-descent recall $r")
  }

  test("cagra optimize: degree cap holds and nearest edges survive") {
    val knn = AllNeighbors.exact(small, 16, Metric.L2Sqrt, "id", "vec")
    val opt = CagraOptimize.optimize(knn.select(col("src"), col("dst"), col("dist")), degree = 8)
    assert(opt.groupBy(col("src")).count().filter(col("count") > 8).count() == 0)
    // the rank-1 (nearest) edge has zero detours and must survive the prune
    val nearest = knn.filter(col("rank") === 1).select(col("src"), col("dst"))
    val missing = nearest.except(opt.select(col("src"), col("dst"))).count()
    assert(missing == 0, s"$missing nearest edges pruned")
  }

  test("cagra optimizeConnected re-bridges components the degree cap cut") {
    import spark.implicits._
    // two tight 5-cliques joined only by long bridge edges; each node has
    // >= 2 shorter intra-cluster edges, so a degree-2 cap drops every
    // bridge and disconnects the graph
    val intra = for {
      g <- Seq(0L, 5L); a <- 0L until 5L; b <- 0L until 5L if a != b
    } yield (g + a, g + b, 1.0 + 0.01 * (a + b))
    val bridges = Seq((0L, 5L, 10.0), (5L, 0L, 10.0))
    val g = (intra ++ bridges).toDF("src", "dst", "dist")
    def nComponents(edges: org.apache.spark.sql.DataFrame): Long = {
      val verts = g.select(col("src").as("id"))
        .unionByName(g.select(col("dst").as("id"))).distinct()
      Components.connectedComponents(verts, edges)
        .select(col("component")).distinct().count()
    }
    val cut = CagraOptimize.optimize(g, degree = 2)
    assert(nComponents(cut.select(col("src"), col("dst"))) == 2, "prune should disconnect")
    val fixed = CagraOptimize.optimizeConnected(g, degree = 2)
    assert(nComponents(fixed.select(col("src"), col("dst"))) == 1, "guarantee should bridge")
    // the bridge is additive: every pruned edge is still present
    assert(cut.select(col("src"), col("dst"))
      .except(fixed.select(col("src"), col("dst"))).count() == 0)
  }

  test("optimizeConnected re-bridges on the fully distributed route (no local kernel)") {
    import spark.implicits._
    // same two-clique fixture as above, with the in-memory union-find route
    // conf-disabled: labels must stay distributed end-to-end (the 1B-node
    // regime, where a per-vertex label collect would OOM the driver)
    val intra = for {
      g <- Seq(0L, 5L); a <- 0L until 5L; b <- 0L until 5L if a != b
    } yield (g + a, g + b, 1.0 + 0.01 * (a + b))
    val bridges = Seq((0L, 5L, 10.0), (5L, 0L, 10.0))
    val g = (intra ++ bridges).toDF("src", "dst", "dist")
    spark.conf.set("spark.graft.localKernel.enabled", "false")
    try {
      val fixed = CagraOptimize.optimizeConnected(g, degree = 2)
      val verts = g.select(col("src").as("id"))
        .unionByName(g.select(col("dst").as("id"))).distinct()
      val n = Components.connectedComponents(verts, fixed.select(col("src"), col("dst")))
        .select(col("component")).distinct().count()
      assert(n == 1, "distributed route failed to re-bridge")
    } finally spark.conf.set("spark.graft.localKernel.enabled", "true")
  }

  test("ace build: partition row budget raises the effective count, floors hold") {
    // the budget path only engages past 25k rows by default, so force it
    // with a tiny budget: 500 rows / budget 100 -> 5 effective partitions
    // over the caller's floor of 2. Both builds must produce a searchable
    // degree-capped graph with on-disk artifacts.
    val e = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") % 25 === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exact = ops.BruteForceKnn.knnJoin(e, q, 10, Metric.L2, "id", "vec")
      .select(col("qid"), col("nbr_id"))
    def recallOf(g: org.apache.spark.sql.DataFrame): Double = {
      val got = graphops.GraphSearch.search(g.select(col("src"), col("dst")), e, q, 10,
        graphops.GraphSearch.Params(itopk = 40, searchWidth = 4, maxIterations = 10),
        "id", "vec")
      got.select(col("qid"), col("nbr_id")).intersect(exact).count().toDouble / exact.count()
    }
    def checkBuild(budget: Int): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("graft_ace_test").toString
      try {
        val g = CagraOptimize.buildAce(e, npartitions = 2, buildDir = dir,
          degree = 8, metric = Metric.L2Sqrt, partitionRowBudget = budget)
          .localCheckpoint()
        assert(g.groupBy(col("src")).count().filter(col("count") > 8).count() == 0,
          s"degree cap violated at budget $budget")
        assert(new java.io.File(s"$dir/knn_graph.parquet").exists(), "knn artifact missing")
        assert(new java.io.File(s"$dir/optimized_graph.parquet").exists(), "graph artifact missing")
        val r = recallOf(g)
        assert(r >= 0.8, s"ace recall $r at budget $budget")
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(dir)).deleteRecursively()
      }
    }
    checkBuild(budget = 1000000) // floor path (the fixture default)
    checkBuild(budget = 100)     // budget path: 5 effective partitions
  }

  test("connected components: planted duplicate pairs form 2-node components") {
    val dup = small.select((col("id") + 10000).as("id"), col("vec"))
    val corpus = small.unionByName(dup)
    val edges = graft.ops.PairwiseDistance.epsNeighborhood(
        corpus, corpus, 0.01, Metric.L2Sqrt, "id", "vec", "id", "vec")
      .filter(col("aid") < col("bid"))
      .select(col("aid").as("src"), col("bid").as("dst"))
    val cc = Components.connectedComponents(corpus, edges, "id")
    // each pair (id, id+10000) shares a component labeled by the original id
    val bad = cc.filter((col("id") < 10000 && col("component") =!= col("id")) ||
        (col("id") >= 10000 && col("component") =!= col("id") - 10000)).count()
    assert(bad == 0)
  }

  test("single linkage matches naive driver-side single-linkage partition") {
    val pts = small.limit(40).localCheckpoint()
    val knn = AllNeighbors.exact(pts, 39, Metric.L2Sqrt, "id", "vec")
    val got = Components.singleLinkageLabels(pts,
        knn.select(col("src"), col("dst"), col("dist")), nClusters = 4, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive: full pairwise single linkage via repeated closest-cluster merge
    val data = pts.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    var clusters = data.map(p => Set(p._1)).toBuffer
    val vecOf = data.toMap
    def d(a: Set[Long], b: Set[Long]) =
      (for (x <- a; y <- b) yield graft.core.Distance.l2Sqrt(vecOf(x), vecOf(y))).min
    while (clusters.size > 4) {
      val pairs = for (i <- clusters.indices; j <- i + 1 until clusters.size)
        yield (i, j, d(clusters(i), clusters(j)))
      val (i, j, _) = pairs.minBy(_._3)
      clusters(i) = clusters(i) ++ clusters(j)
      clusters.remove(j)
    }
    val naive = clusters.flatMap(c => c.map(_ -> c.min)).toMap
    // same partition structure: co-membership must agree
    val ids = data.map(_._1)
    for (a <- ids; b <- ids) {
      assert((got(a) == got(b)) == (naive(a) == naive(b)), s"pair $a,$b disagrees")
    }
  }

  test("boruvka MST: distributed route == in-memory kernel route, edge for edge") {
    // the distributed route keeps labels in a DataFrame and ships only the
    // per-round merged-roots remap; the ordering contract ((dist, src, dst)
    // proposals, sorted union order) must make its MST edge SEQUENCE
    // identical to the kernel route's
    val pts = small.limit(60).localCheckpoint()
    val knn = AllNeighbors.exact(pts, 12, Metric.L2Sqrt, "id", "vec")
      .select(col("src"), col("dst"), col("dist")).localCheckpoint()
    val kernel = Components.boruvkaMst(pts, knn, "id")
    spark.conf.set("spark.graft.localKernel.enabled", "false")
    try {
      val dist = Components.boruvkaMst(pts, knn, "id")
      assert(dist == kernel, s"route mismatch: ${dist.size} vs ${kernel.size} edges")
    } finally spark.conf.set("spark.graft.localKernel.enabled", "true")
  }

  test("mutual reachability: MR weights and cut match a naive driver-side oracle") {
    val pts = small.limit(40).localCheckpoint()
    val knn = AllNeighbors.exact(pts, 12, Metric.L2Sqrt, "id", "vec").localCheckpoint()
    val minPts = 4
    val mr = Components.mutualReachability(knn, minPts)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // naive: core = dist to minPts-th nearest other point, MR = max of the three
    val data = pts.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val vecOf = data.toMap
    val ids = data.map(_._1)
    def dst(a: Long, b: Long) = graft.core.Distance.l2Sqrt(vecOf(a), vecOf(b))
    val core = ids.map(a =>
      a -> ids.filter(_ != a).map(b => dst(a, b)).sorted.apply(minPts - 1)).toMap
    val knnEdges = knn.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(mr.size == knnEdges.length)
    knnEdges.foreach { case (a, b, d) =>
      val want = math.max(d, math.max(core(a), core(b)))
      assert(math.abs(mr((a, b)) - want) < 1e-9, s"MR($a,$b)")
    }
    // cut equivalence: labels = connected components of MR-thresholded edges
    val t = core.values.toSeq.sorted.apply(core.size / 2) // median core distance
    val got = Components.mutualReachabilityCut(pts, knn, minPts, t, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive union-find over MR edges < t
    val parent = scala.collection.mutable.Map(ids.map(v => v -> v): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    knnEdges.foreach { case (a, b, d) =>
      if (math.max(d, math.max(core(a), core(b))) < t) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    ids.foreach { a => assert(got(a) == find(a), s"label of $a") }
  }

  test("lanczos spectral: bottom eigenvalues match the dense Laplacian") {
    val params = Spectral.Params(nComponents = 3, nNeighbors = 10, dropFirst = false)
    // naive dense oracle: build the normalized Laplacian of the same exact
    // kNN graph on the driver and take its bottom eigenvalues
    val knn = AllNeighbors.exact(small, 10, Metric.L2, "id", "vec")
      .select(col("src"), col("dst"))
    val adj = knn.unionByName(knn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = small.select(col("id")).collect().map(_.getLong(0)).sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val deg = new Array[Double](n)
    adj.foreach { case (s, _) => deg(idx(s)) += 1.0 }
    val lap = Array.fill(n, n)(0.0)
    for (i <- 0 until n) lap(i)(i) = 1.0
    adj.foreach { case (s, d) =>
      lap(idx(s))(idx(d)) = -1.0 / math.sqrt(deg(idx(s)) * deg(idx(d))) }
    val (vals, _) = graft.core.Eigen.symEigen(lap)
    val dense = vals.sorted.take(3)

    val ritz = Spectral.lanczosEigenvalues(small, params, lanczosSteps = 30, "id", "vec")
    ritz.zip(dense).zipWithIndex.foreach { case ((l, d), i) =>
      // extreme pairs converge geometrically; the float32 embedding cast
      // bounds the achievable Rayleigh accuracy around 1e-5
      assert(math.abs(l - d) < 5e-4, s"eigenvalue $i: lanczos $l vs dense $d")
    }
  }

  test("spectral clustering separates two far-apart groups") {
    val shifted = small.select((col("id") + 10000).as("id"),
      org.apache.spark.sql.functions.transform(col("vec"), x => x + 100.0f).as("vec"))
    val corpus = small.unionByName(shifted)
    val labels = Spectral.fitPredict(corpus, 2, Spectral.Params(nNeighbors = 8), "id", "vec")
    val crossed = labels.as("a").join(labels.as("b"),
        col("a.id") + 10000 === col("b.id"))
      .filter(col("a.cluster") === col("b.cluster")).count()
    assert(crossed == 0, "original and far-shifted copy in the same cluster")
    assert(labels.select(countDistinct(col("cluster"))).head().getLong(0) == 2)
  }
}
