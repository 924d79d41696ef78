package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.graphops.{AllNeighbors, CagraExtend, CagraOptimize, Components, GraphSearch, NnDescent, Spectral, Vamana}
import graft.index.Hnsw
import graft.ops.BruteForceKnn

/** Driver queries + oracles for the graph-construction surface
  * (SURVEY.md §2.6) and the graph algorithms behind dedup/clustering. */
object GraphQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.table(spark, dir, "embeddings")

  /** ACE build dirs are per-pid scratch (the buildDir/use_disk artifacts
    * outlive the SparkSession on purpose, but not the JVM): one shutdown
    * hook deletes every dir this process created, so repeated bench/verify
    * runs don't accumulate parquet trees in /tmp. */
  private val aceDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val aceHookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      aceDirs.forEach { d =>
        val root = java.nio.file.Paths.get(d)
        if (java.nio.file.Files.exists(root)) {
          val it = java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          try it.forEach(p => java.nio.file.Files.deleteIfExists(p))
          finally it.close()
        }
      }))
    true
  }
  private def registerAceCleanup(dir: String): Unit = {
    aceHookInstalled
    aceDirs.add(dir)
  }

  private val l2 = (a: String, b: String) =>
    s"sqrt(list_sum(list_transform(list_zip($a, $b), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ^ 2)))"

  /** Exact 32-NN graph over all embeddings — ONE exact pass feeds both
    * build shapes: the reference-shaped CAGRA build consumes all 32 ranks
    * (cagra.hpp:149-153 disciplines intermediate = 2× output degree), and
    * the cheap degree-8 build's 16-NN pool is its rank prefix. */
  private def exact32Graph(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.memoize(spark, s"exact32:$dir") {
      val e = emb(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      AllNeighbors.exact(e, 32, Metric.L2Sqrt, "id", "vec").localCheckpoint()
    }

  /** Exact 16-NN graph over all embeddings — the rank-16 prefix of the
    * shared 32-NN pass (L2Sqrt ranks identically, so the prefix IS the
    * exact 16-NN graph). Base pool for the cheap builds + ground truth. */
  private def exact16Graph(spark: SparkSession, dir: String): DataFrame =
    exact32Graph(spark, dir).filter(col("rank") <= 16)

  // ===== all_neighbors / nn_descent (approximate; recall reported) ======

  /** The degree-10 all_neighbors graph — built once, shared between the
    * raw-graph query and its recall report. */
  private def approx10Graph(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.memoize(spark, s"allnbr10:$dir") {
      // build() localCheckpoints internally (eager); no second copy here
      AllNeighbors.build(emb(spark, dir),
          AllNeighbors.Params(k = 10, nClusters = 8, overlapFactor = 2, kmeansIters = 5),
          "vec_id", "embedding")
    }

  /** Per-node invariants of the all_neighbors graph, each COMPUTED from
    * the actual edges (the booleans are earned, not constants): exactly k
    * out-edges, ranks a 1..k permutation, no self-loops, dist
    * non-decreasing with rank, and every emitted dist equal to the true
    * L2 distance of its endpoints (recomputed from the vectors). The
    * oracle predicts (id, k, all-true) for every node — exact per-row
    * match; which neighbors the clustered build picked is the one free
    * variable, and its quality is gated by all_neighbors_recall. */
  private def allNeighborsQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val g = approx10Graph(spark, dir)
      .join(e.select(col("vec_id").as("src"), col("embedding").as("_sv")), "src")
      .join(e.select(col("vec_id").as("dst"), col("embedding").as("_dv")), "dst")
      .select(col("src"), col("dst"), col("rank"), col("dist"),
        graft.functions.vector_distance(Metric.L2, col("_sv"), col("_dv")).as("_true"))
    g.groupBy(col("src").as("id"))
      .agg(
        count(lit(1)).as("n_edges"),
        (count_distinct(col("rank")) === count(lit(1)) &&
          min(col("rank")) === 1 && max(col("rank")) === count(lit(1))).as("ranks_ok"),
        (sum(when(col("dst") === col("src"), 1).otherwise(0)) === 0).as("self_free"),
        max(abs(col("dist") - col("_true"))).as("_derr"),
        sort_array(collect_list(struct(col("rank"), col("dist")))).as("_byRank"))
      .select(col("id"), col("n_edges"), col("ranks_ok"), col("self_free"),
        (col("_derr") < 1e-4).as("dist_exact"),
        forall(zip_with(col("_byRank"), slice(col("_byRank"), 2, 1000000),
            (a, b) => b.isNull || a.getField("dist") <= b.getField("dist")),
          x => x).as("dist_sorted"))
  }

  /** Recall-floor report in the reference's unit-test discipline
    * (BASELINE.md: explicit min_recall per config): the floor and the
    * measured pass/fail hash-match the oracle; counts come from the data.
    * The raw graph itself is the all_neighbors_graph query. */
  private def allNeighborsRecallQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val approx = approx10Graph(spark, dir)
    // L2 and L2Sqrt rank identically, so the exact 10-NN edge set is the
    // shared 16-NN graph truncated to rank <= 10 (graphRecall compares
    // (src, dst) pairs only)
    val exact = exact16Graph(spark, dir).filter(col("rank") <= 10)
    val recall = AllNeighbors.graphRecall(approx, exact)
    e.agg(count(lit(1)).as("n_nodes"))
      .select(col("n_nodes"), lit(10).as("k"),
        lit(0.65).as("recall_floor"), lit(recall >= 0.65).as("floor_met"))
  }

  private val allNeighborsRecallOracle: String =
    """SELECT count(*) AS n_nodes, CAST(10 AS INT) AS k,
      |CAST(0.65 AS DOUBLE) AS recall_floor, true AS floor_met FROM embeddings""".stripMargin

  /** NN-descent at the reference's intermediate-degree discipline
    * (cagra.hpp:149-153: intermediate_graph_degree = 2x graph_degree):
    * refine at degree 20, truncate to the top-10 — a degree-10 build
    * plateaus near 0.75 recall on the sf0.1 fixture, the 2x build holds
    * 0.97+ at both fixtures. */
  private def nnDescentRecallQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 2 === 0)
    val approx = NnDescent.build(e,
      NnDescent.Params(k = 20, maxIterations = 4, terminationThreshold = 0.0),
      "vec_id", "embedding").filter(col("rank") <= 10)
    // r17: the GROUND-TRUTH side is a fixed derivation of the fixture, not
    // part of the operator under test — memoized like every other exact
    // graph here (exact32/exact16q/exact15f), so repeated runs time the
    // NN-descent build + recall join only (the truth build is charged to
    // the artifact pre-pass)
    val exact = SparkEntry.memoize(spark, s"exactNnd10:$dir") {
      AllNeighbors.exact(e, 10, Metric.L2, "vec_id", "embedding")
        .select(col("src"), col("dst")).localCheckpoint()
    }
    val recall = AllNeighbors.graphRecall(approx, exact)
    e.agg(count(lit(1)).as("n_nodes"))
      .select(col("n_nodes"), lit(10).as("k"),
        lit(0.9).as("recall_floor"), lit(recall >= 0.9).as("floor_met"))
  }

  private val nnDescentRecallOracle: String =
    """SELECT count(*) AS n_nodes, CAST(10 AS INT) AS k,
      |CAST(0.9 AS DOUBLE) AS recall_floor, true AS floor_met
      |FROM embeddings WHERE vec_id % 2 = 0""".stripMargin

  // ===== cagra optimize (deterministic over the exact graph; oracled) ===

  /** Exact 16-NN over the %4 subset — shared by cagra_optimize and
    * cagra_connected (same build/derive split as exact16Graph). */
  private def exact16Quarter(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.memoize(spark, s"exact16q:$dir") {
      val e = emb(spark, dir).filter(col("vec_id") % 4 === 0)
      AllNeighbors.exact(e, 16, Metric.L2Sqrt, "vec_id", "embedding").localCheckpoint()
    }

  private def cagraOptimizeQuery(spark: SparkSession, dir: String): DataFrame = {
    val knn = exact16Quarter(spark, dir)
    CagraOptimize.optimize(knn.select(col("src"), col("dst"), col("dist")), degree = 8)
      .select(col("src"), col("dst"), col("rank"), round(col("dist"), 4).as("dist"))
  }

  private val cagraOptimizeOracle: String =
    s"""WITH x AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id % 4 = 0),
       |d AS (SELECT a.id AS src, b.id AS dst, ${l2("a.embedding", "b.embedding")} AS dist
       |      FROM x a JOIN x b ON a.id <> b.id),
       |e AS (SELECT src, dst, dist FROM (
       |      SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rk FROM d)
       |      WHERE rk <= 16),
       |det AS (SELECT sd.src, sd.dst, count(*) AS detours
       |      FROM e sd JOIN e sv ON sd.src = sv.src JOIN e vd ON sv.dst = vd.src AND vd.dst = sd.dst
       |      WHERE sv.dist < sd.dist AND vd.dist < sd.dist
       |      GROUP BY sd.src, sd.dst),
       |scored AS (SELECT e.src, e.dst, e.dist, coalesce(det.detours, 0) AS detours
       |      FROM e LEFT JOIN det ON det.src = e.src AND det.dst = e.dst),
       |pruned AS (SELECT src, dst, dist FROM (
       |      SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY detours, dist, dst) AS rk
       |      FROM scored) WHERE rk <= 8),
       |aug AS (SELECT src, dst, min(dist) AS dist FROM (
       |      SELECT src, dst, dist FROM pruned
       |      UNION ALL SELECT dst AS src, src AS dst, dist FROM pruned) GROUP BY 1, 2)
       |SELECT src, dst, rank, round(dist, 4) AS dist FROM (
       |  SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rank FROM aug)
       |WHERE rank <= 8""".stripMargin

  /** guarantee_connectivity (cagra.hpp:369-380): optimizeConnected must
    * leave the pruned graph exactly as connected as its input. The oracle
    * counts the 16-NN graph's true components with a recursive CTE and
    * asserts the output component count equals it — a measured value on
    * the Spark side, an exact recomputation on the oracle side. */
  private def cagraConnectedQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 4 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val knn = exact16Quarter(spark, dir).select(col("src"), col("dst"), col("dist"))
    val g = CagraOptimize.optimizeConnected(knn, degree = 4)
    val nIn = Components.connectedComponents(e, knn, "id")
      .select(col("component")).distinct().count()
    val nOut = Components.connectedComponents(e, g.select(col("src"), col("dst")), "id")
      .select(col("component")).distinct().count()
    e.agg(count(lit(1)).as("n_nodes"))
      .select(col("n_nodes"), lit(4).as("degree"),
        lit(nIn).as("n_components_input"), lit(nOut).as("n_components_output"))
  }

  private val cagraConnectedOracle: String =
    s"""WITH RECURSIVE x AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id % 4 = 0),
       |d AS (SELECT a.id AS src, b.id AS dst, ${l2("a.vec", "b.vec")} AS dist
       |      FROM x a JOIN x b ON a.id <> b.id),
       |e AS (SELECT src, dst FROM (
       |      SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rk FROM d)
       |      WHERE rk <= 16),
       |und AS (SELECT src AS a, dst AS b FROM e
       |      UNION SELECT dst, src FROM e UNION SELECT id, id FROM x),
       |reach AS (SELECT a, b FROM und
       |      UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
       |comp AS (SELECT count(DISTINCT c) AS n FROM (SELECT a, min(b) AS c FROM reach GROUP BY a))
       |SELECT (SELECT count(*) FROM x) AS n_nodes, CAST(4 AS INT) AS degree,
       |       comp.n AS n_components_input, comp.n AS n_components_output FROM comp""".stripMargin

  // ===== connected components (deterministic; recursive-CTE oracle) =====

  private def componentsQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val edges = graft.ops.PairwiseDistance.epsNeighborhood(
        e, e, 3.0, Metric.L2Sqrt, "id", "vec", "id", "vec")
      .filter(col("aid") < col("bid"))
      .select(col("aid").as("src"), col("bid").as("dst"))
    Components.connectedComponents(e, edges, "id")
  }

  private val componentsOracle: String =
    s"""WITH RECURSIVE x AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id % 5 = 0),
       |edges AS (SELECT a.id AS src, b.id AS dst FROM x a JOIN x b
       |      ON a.id < b.id AND ${l2("a.vec", "b.vec")} < 3.0),
       |und AS (SELECT src AS a, dst AS b FROM edges
       |      UNION SELECT dst, src FROM edges UNION SELECT id, id FROM x),
       |reach AS (SELECT a, b FROM und
       |      UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
       |SELECT a AS id, min(b) AS component FROM reach GROUP BY a""".stripMargin

  // ===== single linkage / spectral =====================================

  /** Exact 15-NN over the %5 subset — shared by single_linkage and
    * mutual_reachability. */
  private def exact15Fifth(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.memoize(spark, s"exact15f:$dir") {
      val e = emb(spark, dir).filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      AllNeighbors.exact(e, 15, Metric.L2Sqrt, "id", "vec").localCheckpoint()
    }

  /** Single-linkage flat clusters cut at a distance threshold over the
    * exact 15-NN graph. By the MST cut property the labels equal connected
    * components of the 15-NN graph restricted to edges < t, so the Borůvka
    * MST itself is verified by an exact recursive-CTE oracle. */
  private def singleLinkageQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val knn = exact15Fifth(spark, dir)
    Components.singleLinkageCut(e, knn.select(col("src"), col("dst"), col("dist")),
        threshold = 1.2, "id")
  }

  private val singleLinkageOracle: String =
    s"""WITH RECURSIVE x AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id % 5 = 0),
       |d AS (SELECT a.id AS src, b.id AS dst, ${l2("a.vec", "b.vec")} AS dist
       |      FROM x a JOIN x b ON a.id <> b.id),
       |e AS (SELECT src, dst, dist FROM (
       |      SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rk FROM d)
       |      WHERE rk <= 15),
       |cut AS (SELECT src, dst FROM e WHERE dist < 1.2),
       |und AS (SELECT src AS a, dst AS b FROM cut
       |      UNION SELECT dst, src FROM cut UNION SELECT id, id FROM x),
       |reach AS (SELECT a, b FROM und
       |      UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
       |SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a""".stripMargin

  /** Mutual-reachability single linkage (HDBSCAN distance,
    * agglomerative.hpp:121-151) cut at a fixed threshold over the exact
    * 15-NN graph — same MST cut property as single_linkage, so the labels
    * equal connected components of the MR-thresholded graph and the whole
    * pipeline (core distances + re-weighting + Borůvka MST) is verified by
    * an exact recursive-CTE oracle. */
  private def mutualReachabilityQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val knn = exact15Fifth(spark, dir)
    Components.mutualReachabilityCut(e, knn.select(col("src"), col("dst"), col("dist"), col("rank")),
      minPts = 5, threshold = 1.25, "id")
  }

  private val mutualReachabilityOracle: String =
    s"""WITH RECURSIVE x AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id % 5 = 0),
       |d AS (SELECT a.id AS src, b.id AS dst, ${l2("a.vec", "b.vec")} AS dist
       |      FROM x a JOIN x b ON a.id <> b.id),
       |e AS (SELECT src, dst, dist, rk FROM (
       |      SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rk FROM d)
       |      WHERE rk <= 15),
       |core AS (SELECT src AS id, dist AS core FROM e WHERE rk = 5),
       |mr AS (SELECT e.src, e.dst, greatest(e.dist, ca.core, cb.core) AS dist
       |      FROM e JOIN core ca ON e.src = ca.id JOIN core cb ON e.dst = cb.id),
       |cut AS (SELECT src, dst FROM mr WHERE dist < 1.25),
       |und AS (SELECT src AS a, dst AS b FROM cut
       |      UNION SELECT dst, src FROM cut UNION SELECT id, id FROM x),
       |reach AS (SELECT a, b FROM und
       |      UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
       |SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a""".stripMargin

  /** Spectral fit invariants: every sampled point labeled, labels in
    * [0, k). The embedding/eigensolve path is covered by GraphSuite. */
  private def spectralQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Spectral.fitPredict(e, nClusters = 4,
        Spectral.Params(nNeighbors = 10), "id", "vec")
      .agg(count(lit(1)).as("n_points"),
        (min(col("cluster")) >= 0 && max(col("cluster")) < 4).as("labels_valid"))
      .select(col("n_points"), lit(4).as("k"), col("labels_valid"))
  }

  private val spectralOracle: String =
    """SELECT count(*) AS n_points, CAST(4 AS INT) AS k, true AS labels_valid
      |FROM embeddings WHERE vec_id % 5 = 0""".stripMargin

  /** Spectral embedding (Laplacian eigenmap) invariants: every sampled
    * point embedded, declared width, finite values, and near-orthonormal
    * embedding columns (eigenvectors of the symmetric Laplacian) — the
    * eigensolve itself is value-checked against the dense Laplacian in
    * GraphSuite. */
  private def spectralEmbeddingQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val se = Spectral.embedding(e, Spectral.Params(nComponents = 3, nNeighbors = 10),
      "id", "vec")
    // all invariants measured on the OUTPUT (so a dropped row, wrong
    // width, or non-finite value actually fails the gate), one collect
    val rows = se.select(col("spectral")).collect().map(_.getSeq[Float](0).toArray)
    val k = 3
    val widthOk = rows.forall(_.length == k)
    val finiteOk = rows.forall(_.forall(v => !v.isNaN && !v.isInfinite))
    // gram matrix of the embedding columns: off-diagonals ~ 0, diagonals ~ 1
    var orthoOk = widthOk
    if (widthOk) for (a <- 0 until k; b <- a until k) {
      var s = 0.0
      rows.foreach(r => s += r(a).toDouble * r(b).toDouble)
      val want = if (a == b) 1.0 else 0.0
      if (math.abs(s - want) > 1e-3) orthoOk = false
    }
    spark.range(1).select(lit(rows.length.toLong).as("n_points"),
      lit(3).as("n_components"),
      lit(widthOk && finiteOk).as("finite_ok"), lit(orthoOk).as("orthonormal_ok"))
  }

  private val spectralEmbeddingOracle: String =
    """SELECT count(*) AS n_points, CAST(3 AS INT) AS n_components,
      |true AS finite_ok, true AS orthonormal_ok
      |FROM embeddings WHERE vec_id % 5 = 0""".stripMargin

  // ===== vamana / cagra search / hnsw ==================================

  /** Vamana build invariants, verified DISTRIBUTED (no collect): degree
    * cap, and the alpha-RNG prune property — for kept edges (p,c) there is
    * no kept closer neighbor w of p with alpha·d(w,c) <= d(p,c). */
  private def vamanaQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.graphops.LocalKernel
    val e = emb(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val gRaw = Vamana.build(e, Vamana.Params(graphDegree = 16, visitedSize = 32, alpha = 1.2),
      "id", "vec")
    // Gate-cost kernel (r18, LocalKernel route): the alpha-RNG proof is a
    // per-src pair scan over <= degree kept edges — the join route ships
    // sum(deg²) rows through TWO vector joins to evaluate the same
    // predicate (1.2·d(w,c) <= d(p,c), identical doubles compared, same
    // strict ew.dist < ec.dist pairing). Booleans identical; the joins
    // below stay as the at-scale path.
    val (degOk, alphaOk) =
      if (LocalKernel.enabled(spark) &&
          LocalKernel.within(e, LocalKernel.maxVectors(spark)) &&
          LocalKernel.within(gRaw, LocalKernel.maxEdges(spark))) {
        import spark.implicits._
        val vecs = new java.util.HashMap[Long, Array[Float]]()
        e.as[(Long, Array[Float])].collect().foreach { case (i, v) => vecs.put(i, v) }
        val bySrc = gRaw.select(col("src").cast("long"), col("dst").cast("long"),
            col("dist").cast("double"))
          .as[(Long, Long, Double)].collect().groupBy(_._1)
        val distFn = graft.core.Distance.fn(Metric.L2Sqrt)
        val dOk = bySrc.valuesIterator.forall(_.length <= 16)
        var violations = 0L
        bySrc.valuesIterator.foreach { es =>
          var i = 0
          while (i < es.length) {
            val (_, cDst, cDist) = es(i)
            val cvec = vecs.get(cDst)
            var j = 0
            while (j < es.length) {
              if (es(j)._3 < cDist &&
                  1.2 * distFn(vecs.get(es(j)._2), cvec) <= cDist) violations += 1
              j += 1
            }
            i += 1
          }
        }
        (dOk, violations == 0L)
      } else {
        val g = gRaw.cache()
        val dOk = g.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .agg(max(col("deg")).as("m")).select((col("m") <= 16).as("ok")).head().getBoolean(0)
        val vecs = e.select(col("id"), col("vec"))
        val violations = g.as("ec").join(g.as("ew"),
            col("ec.src") === col("ew.src") && col("ew.dist") < col("ec.dist"))
          .join(vecs.select(col("id").as("_wc"), col("vec").as("wvec")),
            col("ew.dst") === col("_wc"))
          .join(vecs.select(col("id").as("_cc"), col("vec").as("cvec")),
            col("ec.dst") === col("_cc"))
          .filter(lit(1.2) * graft.functions.vector_distance(Metric.L2Sqrt,
            col("wvec"), col("cvec")) <= col("ec.dist"))
          .count()
        (dOk, violations == 0L)
      }
    e.agg(count(lit(1)).as("n_nodes"))
      .select(col("n_nodes"), lit(16).as("graph_degree"),
        lit(degOk).as("degree_ok"), lit(alphaOk).as("alpha_rng_ok"))
  }

  private val vamanaOracle: String =
    """SELECT count(*) AS n_nodes, CAST(16 AS INT) AS graph_degree,
      |true AS degree_ok, true AS alpha_rng_ok FROM embeddings""".stripMargin

  /** Recall of `got` against the self-inclusive exact top-10 truth over
    * the %20 query subset: queries are dataset rows, so a search
    * legitimately returns the query itself at dist 0 — truth is
    * {self} ∪ top-9 of the (self-exclusive) exact 16-NN graph. One
    * definition serves every full-dataset graph-search gate, so a fix to
    * the truth construction can never drift between them. */
  private def selfInclusiveRecall(spark: SparkSession, dir: String,
      got: DataFrame, q: DataFrame): Double = {
    val exact = exact16Graph(spark, dir)
      .filter(col("src") % 20 === 0 && col("rank") <= 9)
      .select(col("src").as("qid"), col("dst").as("nbr_id"))
      .unionAll(q.select(col("qid"), col("qid").as("nbr_id")))
    graft.core.Recall.matched(got.select(col("qid"), col("nbr_id")), exact).toDouble /
      (q.count() * 10)
  }

  /** The degree-8 CAGRA-optimized graph over exact16Graph — the CHEAP
    * build, consumed by the cagra_search_cheap cost row (the filtered
    * query moved to the reference-shaped graph in r11). */
  private def cagraOpt8(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.memoize(spark, s"cagraOpt8:$dir") {
      CagraOptimize.optimize(
        exact16Graph(spark, dir).select(col("src"), col("dst"), col("dist")), degree = 8)
        .localCheckpoint()
    }

  /** The reference-SHAPED CAGRA build — degree 16 pruned from the 32-NN
    * pool (cagra.hpp:149-153's 2:1 intermediate:output ratio at fixture
    * scale). This is the build the recall gates hold to the reference's
    * own 0.95+ floors (ann_cagra.cuh:271,473); it is also the HNSW gate's
    * layer 0 (hnsw.hpp:43-65 converts exactly this symmetrized CAGRA
    * graph). Shared by cagra_search_recall and hnsw_search_recall. */
  private def cagraOptRef16(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.memoize(spark, s"cagraOptRef16:$dir") {
      CagraOptimize.optimize(
        exact32Graph(spark, dir).select(col("src"), col("dst"), col("dist")), degree = 16)
        .localCheckpoint()
    }

  /** CAGRA pipeline end-to-end at the REFERENCE build shape: optimize the
    * exact 32-NN graph to degree 16 and traverse it — recall-floor report
    * at the reference's own floor (ann_cagra.cuh:271,473 pins 0.95–0.995
    * per config; RECALL_PARETO's cagra_ref rows measure 0.999 here). */
  private def cagraSearchQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") % 20 === 0).select(col("id").as("qid"), col("vec").as("qvec"))
    val g = cagraOptRef16(spark, dir)
    val got = GraphSearch.search(g.select(col("src"), col("dst")), e, q, 10,
      GraphSearch.Params(itopk = 40, searchWidth = 4, maxIterations = 12), "id", "vec")
    val recall = selfInclusiveRecall(spark, dir, got, q)
    q.agg(count(lit(1)).as("n_queries"))
      .select(col("n_queries"), lit(10).as("k"), lit(40).as("itopk"), lit(16).as("degree"),
        lit(0.95).as("recall_floor"), lit(recall >= 0.95).as("floor_met"))
  }

  private val cagraSearchOracle: String =
    """SELECT count(*) AS n_queries, CAST(10 AS INT) AS k, CAST(40 AS INT) AS itopk,
      |CAST(16 AS INT) AS degree,
      |CAST(0.95 AS DOUBLE) AS recall_floor, true AS floor_met
      |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin

  /** The CHEAP-build cost row: the degree-8 graph pruned from the 16-NN
    * pool — the bench's low-cost point. Gated at its own (lower) floor so
    * the cost/recall trade stays a measured row next to the
    * reference-shaped gate above. */
  private def cagraSearchCheapQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") % 20 === 0).select(col("id").as("qid"), col("vec").as("qvec"))
    val g = cagraOpt8(spark, dir)
    val got = GraphSearch.search(g.select(col("src"), col("dst")), e, q, 10,
      GraphSearch.Params(itopk = 40, searchWidth = 4, maxIterations = 10), "id", "vec")
    val recall = selfInclusiveRecall(spark, dir, got, q)
    q.agg(count(lit(1)).as("n_queries"))
      .select(col("n_queries"), lit(10).as("k"), lit(40).as("itopk"), lit(8).as("degree"),
        lit(0.85).as("recall_floor"), lit(recall >= 0.85).as("floor_met"))
  }

  private val cagraSearchCheapOracle: String =
    """SELECT count(*) AS n_queries, CAST(10 AS INT) AS k, CAST(40 AS INT) AS itopk,
      |CAST(8 AS INT) AS degree,
      |CAST(0.85 AS DOUBLE) AS recall_floor, true AS floor_met
      |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin

  /** ACE partitioned build end-to-end: balanced-coarse partitioned kNN
    * build (core + augmented cells) spilled through a disk build dir,
    * detour-pruned to degree 8, then the same itopk-40 traversal as
    * cagra_search_recall — same degree, same floor, so the partitioned
    * build mode is held to the in-memory path's recall bar. */
  private def cagraAceQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") % 20 === 0).select(col("id").as("qid"), col("vec").as("qvec"))
    val g = SparkEntry.memoize(spark, s"cagraAceRef16:$dir") {
      val buildDir = s"${System.getProperty("java.io.tmpdir")}/graft_ace_" +
        s"${ProcessHandle.current().pid()}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      registerAceCleanup(buildDir)
      // reference shape: degree 16 from a 32-wide per-partition build
      // (intermediateDegree defaults to 2*degree), held to the in-memory
      // reference-shaped path's 0.95 floor
      CagraOptimize.buildAce(e, npartitions = 4, buildDir, degree = 16)
    }
    val got = GraphSearch.search(g.select(col("src"), col("dst")), e, q, 10,
      GraphSearch.Params(itopk = 40, searchWidth = 4, maxIterations = 12), "id", "vec")
    val recall = selfInclusiveRecall(spark, dir, got, q)
    q.agg(count(lit(1)).as("n_queries"))
      .select(col("n_queries"), lit(10).as("k"), lit(4).as("npartitions"),
        lit(0.95).as("recall_floor"), lit(recall >= 0.95).as("floor_met"))
  }

  private val cagraAceOracle: String =
    """SELECT count(*) AS n_queries, CAST(10 AS INT) AS k, CAST(4 AS INT) AS npartitions,
      |CAST(0.95 AS DOUBLE) AS recall_floor, true AS floor_met
      |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin

  /** The shared 80%-of-%2 base graph for BOTH extend pipelines
    * (cagra_extend_recall and hnsw_extend_recall insert the same 20% into
    * the same base): exact 32-NN over baseRows, detour-pruned to degree 16
    * — the reference build shape, so both extend gates hold the insert
    * path to the reference's 0.95 floor.
    * Built once per dataset so the bench charges it to one artifact. */
  private def extBase8(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.memoize(spark, s"extBaseRef16:$dir") {
      val baseRows = emb(spark, dir)
        .filter(col("vec_id") % 2 === 0 && col("vec_id") % 10 =!= 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      // reference shape (cagra.hpp:149-153): degree 16 from the 32-NN pool
      CagraOptimize.optimize(
        AllNeighbors.exact(baseRows, 32, Metric.L2Sqrt, "id", "vec")
          .select(col("src"), col("dst"), col("dist")), degree = 16)
        .localCheckpoint()
    }

  /** CAGRA graph extend end-to-end (cagra.hpp:363-374, add_nodes.cuh):
    * build over 80% of the %2 subset, chunk-insert the other 20%
    * (3 chunks, so later chunks link to earlier ones), then search with
    * queries EXTERNAL to the insert batch against full-dataset truth —
    * the reference's own extend-validation discipline
    * (ann_cagra.cuh:623-701) at the in-memory build path's recall bar.
    * `new_full_degree` is computed from the extended edge list: every
    * inserted node present with exactly `degree` out-edges. */
  /** The chunk-extended degree-16 edge list over the %2 subset — the shared
    * product of the CagraExtend surgery: consumed directly by
    * cagra_extend_recall and as the layer 0 of hnsw_extend_recall
    * (`Hnsw.extend` IS `fromGraph(CagraExtend.extend(layer0, …), all)` —
    * asserted edge-for-edge by GraphIndexSuite's hnsw-extend spec — so the
    * bench pays the chunked insert once, not once per consumer). */
  private def ext8(spark: SparkSession, dir: String): DataFrame = {
    // resolved OUTSIDE the memoize block so the shared base build is
    // charged to its own artifact, not to whichever extend runs first
    val baseGraph = extBase8(spark, dir)
    SparkEntry.memoize(spark, s"cagraExt8:$dir") {
      val s = emb(spark, dir).filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val addRows = s.filter(col("id") % 10 === 0)
      val baseRows = s.filter(col("id") % 10 =!= 0)
      val nAdd = addRows.count()
      CagraExtend.extend(baseGraph, baseRows, addRows, 16,
        CagraExtend.Params(maxChunkSize = math.max(1L, (nAdd + 2) / 3).toInt))
        .localCheckpoint()
    }
  }

  /** Exact 10-NN truth for the %2 corpus / %20==2 query slice — shared by
    * cagra_extend_recall and hnsw_extend_recall, which measure different
    * operators against the SAME fixture-derived ground truth. Memoized
    * like exact32/exact16q (r17): the truth build is charged to the
    * artifact pre-pass, repeated runs time the operator only. */
  private def exactHalfQ10(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.memoize(spark, s"exactHalfQ10:$dir") {
      val s = emb(spark, dir).filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = s.filter(col("id") % 20 === 2)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      BruteForceKnn.knnJoin(s, q, 10, Metric.L2, "id", "vec")
        .select(col("qid"), col("nbr_id")).localCheckpoint()
    }

  private def cagraExtendQuery(spark: SparkSession, dir: String): DataFrame = {
    val s = emb(spark, dir).filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val addRows = s.filter(col("id") % 10 === 0)
    val ext = ext8(spark, dir)
    val q = s.filter(col("id") % 20 === 2).select(col("id").as("qid"), col("vec").as("qvec"))
    val got = GraphSearch.search(ext.select(col("src"), col("dst")), s, q, 10,
      GraphSearch.Params(itopk = 40, searchWidth = 4, maxIterations = 12), "id", "vec")
    val exact = exactHalfQ10(spark, dir)
    val recall = graft.core.Recall.matched(got.select(col("qid"), col("nbr_id")),
      exact).toDouble / (q.count() * 10)
    val newFullDegree = newFullDegreeCheck(spark, ext, addRows, degree = 16)
    q.agg(count(lit(1)).as("n_queries"))
      .select(col("n_queries"), lit(10).as("k"), lit(16).as("degree"),
        lit(newFullDegree).as("new_full_degree"),
        lit(0.95).as("recall_floor"), lit(recall >= 0.95).as("floor_met"))
  }

  /** new_full_degree: every inserted node present with exactly `degree`
    * out-edges. Gate-cost kernel (r18, LocalKernel route): the edge list is
    * a checkpointed |V|·degree frame — the join + groupBy + two counts
    * shipped it through three jobs to compute a per-id counter. Identical
    * booleans (same inner-join-on-add-ids, count-per-src semantics); the
    * join route stays as the at-scale path. */
  private def newFullDegreeCheck(spark: SparkSession, edges: DataFrame,
      addRows: DataFrame, degree: Int): Boolean = {
    import graft.graphops.LocalKernel
    if (LocalKernel.enabled(spark) &&
        LocalKernel.within(edges, LocalKernel.maxEdges(spark)) &&
        LocalKernel.within(addRows, LocalKernel.maxVectors(spark))) {
      val addIds = addRows.select(col("id").cast("long")).collect()
        .map(_.getLong(0)).toSet
      val cnt = new java.util.HashMap[Long, Long]()
      edges.select(col("src").cast("long")).collect().foreach { r =>
        val s = r.getLong(0)
        if (addIds.contains(s)) cnt.merge(s, 1L, _ + _)
      }
      cnt.size == addIds.size && {
        var ok = true
        cnt.forEach { (_, c) => if (c != degree) ok = false }
        ok
      }
    } else {
      val newDeg = edges.join(addRows.select(col("id").as("src")), "src")
        .groupBy(col("src")).count()
      newDeg.count() == addRows.count() &&
        newDeg.filter(col("count") =!= degree).count() == 0
    }
  }

  private val cagraExtendOracle: String =
    """SELECT count(*) AS n_queries, CAST(10 AS INT) AS k, CAST(16 AS INT) AS degree,
      |true AS new_full_degree, CAST(0.95 AS DOUBLE) AS recall_floor, true AS floor_met
      |FROM embeddings WHERE vec_id % 20 = 2""".stripMargin

  /** Filtered CAGRA traversal (cagra.hpp sample_filter + filtering_rate):
    * a third of the nodes are deny-listed; the walk still crosses them but
    * none may be returned. `allowed_only` is computed from the actual
    * result rows (an anti-join count — earned, not a constant), recall is
    * measured against the exact kNN over the allowed subset. */
  private def cagraFilteredQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") % 20 === 0).select(col("id").as("qid"), col("vec").as("qvec"))
    // reference-shaped graph (r11): the filter gate is held to the same
    // 0.95 discipline as the plain search — the reference's filtering
    // tests run on its standard builds, not a degraded one
    val g = cagraOptRef16(spark, dir)
    val allow = e.filter(col("id") % 3 =!= 0).select(col("id"))
    // more rounds than the unfiltered query: the rate-widened beam (itopk
    // 40 -> 60 at 1/3 filtered) drains slower — recall is iteration-bound;
    // with the frontier-empty early exit the headroom costs jobs only
    // while the beam still improves
    val got = GraphSearch.searchFiltered(g.select(col("src"), col("dst")), e, q, 10,
      GraphSearch.Params(itopk = 40, searchWidth = 4, maxIterations = 20), allow, "id", "vec")
      .localCheckpoint()
    // allowed_only gate-cost kernel (r18): the anti-join proves "no result
    // id outside the allow list" over ≤ n_queries·k checkpointed rows —
    // same left-anti semantics computed as a set-membership scan when both
    // sides are collectable; the anti-join stays as the at-scale path
    val allowedOnly = {
      import graft.graphops.LocalKernel
      if (LocalKernel.enabled(spark) &&
          LocalKernel.within(got, LocalKernel.maxEdges(spark)) &&
          LocalKernel.within(allow, LocalKernel.maxVectors(spark))) {
        val allowSet = allow.select(col("id").cast("long")).collect()
          .map(_.getLong(0)).toSet
        got.select(col("nbr_id").cast("long")).collect()
          .forall(r => allowSet.contains(r.getLong(0)))
      } else
        got.join(allow.withColumnRenamed("id", "nbr_id"),
          Seq("nbr_id"), "left_anti").count() == 0
    }
    // truth over the allowed subset is fixture-derived — memoized like
    // the other exact graphs (r17), so repeated runs time the filtered
    // traversal, not the ground-truth rebuild
    val exact = SparkEntry.memoize(spark, s"exactAllowQ10:$dir") {
      graft.ops.BruteForceKnn.knnJoin(
        e.filter(col("id") % 3 =!= 0), q, 10, Metric.L2, "id", "vec")
        .select(col("qid"), col("nbr_id")).localCheckpoint()
    }
    val recall = graft.core.Recall.matched(
      got.select(col("qid"), col("nbr_id")),
      exact).toDouble / (q.count() * 10)
    q.agg(count(lit(1)).as("n_queries"))
      .select(col("n_queries"), lit(10).as("k"), lit(40).as("itopk"),
        lit(allowedOnly).as("allowed_only"),
        lit(0.95).as("recall_floor"), lit(recall >= 0.95).as("floor_met"))
  }

  private val cagraFilteredOracle: String =
    """SELECT count(*) AS n_queries, CAST(10 AS INT) AS k, CAST(40 AS INT) AS itopk,
      |true AS allowed_only, CAST(0.95 AS DOUBLE) AS recall_floor, true AS floor_met
      |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin

  /** HNSW level layout — EXACT oracle: the geometric level draw runs on a
    * portable double-affine hash, replayed verbatim in SQL. */
  private def hnswLevelsQuery(spark: SparkSession, dir: String): DataFrame =
    Hnsw.assignLevels(emb(spark, dir), Hnsw.Params(m = 16, seed = 42), "vec_id")

  private val hnswLevelsOracle: String =
    """SELECT CAST(vec_id AS BIGINT) AS id,
      |CAST(floor(-ln(((((vec_id * 1000003 + 12387) % 2147483647) * 1000003 + 12387)
      |  % 2147483647 + 0.5) / 2147483647.0) / ln(16.0)) AS INT) AS level
      |FROM embeddings""".stripMargin

  /** HNSW hierarchy search (greedy descent + base-layer ef beam) over the
    * reference-shaped symmetrized CAGRA graph — the reference's own HNSW
    * construction (hnsw.hpp:43-65 converts a CAGRA graph) — recall-floor
    * report at the reference's 0.95 floor. baseIterations is left at auto
    * so the base beam tracks ef instead of saturating at 10 rounds. */
  private def hnswSearchQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") % 20 === 0).select(col("id").as("qid"), col("vec").as("qvec"))
    // memoize the hierarchy like hnswExtendQuery does: the build is index
    // construction, and re-paying it per bench sample priced the BUILD
    // into every search median
    val idx = SparkEntry.memoize(spark, s"hnswSearchRef16:$dir") {
      val built = Hnsw.fromGraph(cagraOptRef16(spark, dir), e,
        Hnsw.Params(m = 16), "id", "vec")
      val out = built.copy(levels = built.levels.localCheckpoint(),
        edges = built.edges.localCheckpoint())
      graft.core.Frames.release(built.edges)
      graft.core.Frames.release(built.levels)
      out
    }
    // explicit ef-tracking bound: the GATE's outcome must not depend on
    // which route (local/hybrid/loop) the host's kernel caps pick — an
    // auto bound resolves to 10 on the loop route, where ef 40 saturates
    val got = Hnsw.search(idx, e, q, 10, ef = 40, "id", "vec", baseIterations = 40)
    val recall = selfInclusiveRecall(spark, dir, got, q)
    q.agg(count(lit(1)).as("n_queries"))
      .select(col("n_queries"), lit(10).as("k"), lit(40).as("ef"),
        lit(0.95).as("recall_floor"), lit(recall >= 0.95).as("floor_met"))
  }

  private val hnswSearchOracle: String =
    """SELECT count(*) AS n_queries, CAST(10 AS INT) AS k, CAST(40 AS INT) AS ef,
      |CAST(0.95 AS DOUBLE) AS recall_floor, true AS floor_met
      |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin

  /** HNSW extend end-to-end: hierarchy built over 80% of the %2 subset,
    * the other 20% chunk-inserted (3 chunks) via the CagraExtend layer-0
    * surgery + level re-draw, then hierarchical search with queries
    * EXTERNAL to the insert batch against full-dataset truth — the same
    * validation discipline and 0.95 floor as cagra_extend_recall.
    * The artifact is the REAL `Hnsw.extend` entry point (base hierarchy
    * over the 80%, then extend) — the bench consumer for the operator,
    * not just its composed parts; GraphIndexSuite separately asserts
    * extend ≡ fromGraph over the extended layer 0 edge-for-edge.
    * `new_full_degree`: every inserted node present at layer 0 with
    * exactly the base degree. */
  private def hnswExtendQuery(spark: SparkSession, dir: String): DataFrame = {
    val s = emb(spark, dir).filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val addRows = s.filter(col("id") % 10 === 0)
    val idx = SparkEntry.memoize(spark, s"hnswExtRef16:$dir") {
      val baseRows = s.filter(col("id") % 10 =!= 0)
      val baseIdx = Hnsw.fromGraph(extBase8(spark, dir), baseRows,
        Hnsw.Params(m = 16, metric = Metric.L2Sqrt), "id", "vec")
      val nAdd = addRows.count()
      val built = Hnsw.extend(baseIdx, baseRows, addRows,
        maxChunkSize = math.max(1L, (nAdd + 2) / 3).toInt)
      val out = built.copy(levels = built.levels.localCheckpoint(),
        edges = built.edges.localCheckpoint())
      // the intermediate hierarchies (base, and the pre-checkpoint
      // extended frames) are consumed above and would otherwise stay
      // cached for the whole session
      graft.core.Frames.release(baseIdx.edges)
      graft.core.Frames.release(baseIdx.levels)
      graft.core.Frames.release(built.edges)
      graft.core.Frames.release(built.levels)
      out
    }
    val q = s.filter(col("id") % 20 === 2).select(col("id").as("qid"), col("vec").as("qvec"))
    // explicit bound: route-independent gate (see hnswSearchQuery)
    val got = Hnsw.search(idx, s, q, 10, ef = 40, "id", "vec", baseIterations = 40)
    val exact = exactHalfQ10(spark, dir)
    val recall = graft.core.Recall.matched(got.select(col("qid"), col("nbr_id")),
      exact).toDouble / (q.count() * 10)
    val newFullDegree =
      newFullDegreeCheck(spark, idx.edges.filter(col("level") === 0), addRows, degree = 16)
    q.agg(count(lit(1)).as("n_queries"))
      .select(col("n_queries"), lit(10).as("k"), lit(16).as("degree"),
        lit(newFullDegree).as("new_full_degree"),
        lit(0.95).as("recall_floor"), lit(recall >= 0.95).as("floor_met"))
  }

  private val hnswExtendOracle: String =
    """SELECT count(*) AS n_queries, CAST(10 AS INT) AS k, CAST(16 AS INT) AS degree,
      |true AS new_full_degree, CAST(0.95 AS DOUBLE) AS recall_floor, true AS floor_met
      |FROM embeddings WHERE vec_id % 20 = 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "all_neighbors_graph" -> (allNeighborsQuery(_, _)),
    "all_neighbors_recall" -> (allNeighborsRecallQuery(_, _)),
    "nn_descent_recall" -> (nnDescentRecallQuery(_, _)),
    "cagra_optimize" -> (cagraOptimizeQuery(_, _)),
    "cagra_connected" -> (cagraConnectedQuery(_, _)),
    "connected_components" -> (componentsQuery(_, _)),
    "single_linkage" -> (singleLinkageQuery(_, _)),
    "mutual_reachability" -> (mutualReachabilityQuery(_, _)),
    "spectral_clustering" -> (spectralQuery(_, _)),
    "spectral_embedding" -> (spectralEmbeddingQuery(_, _)),
    "vamana_build" -> (vamanaQuery(_, _)),
    "cagra_search_recall" -> (cagraSearchQuery(_, _)),
    "cagra_search_cheap" -> (cagraSearchCheapQuery(_, _)),
    "cagra_ace_recall" -> (cagraAceQuery(_, _)),
    "cagra_extend_recall" -> (cagraExtendQuery(_, _)),
    "cagra_filtered_search" -> (cagraFilteredQuery(_, _)),
    "hnsw_levels" -> (hnswLevelsQuery(_, _)),
    "hnsw_search_recall" -> (hnswSearchQuery(_, _)),
    "hnsw_extend_recall" -> (hnswExtendQuery(_, _)),
  )

  private val allNeighborsGraphOracle: String =
    """SELECT vec_id AS id, CAST(10 AS BIGINT) AS n_edges, true AS ranks_ok,
      |true AS self_free, true AS dist_exact, true AS dist_sorted
      |FROM embeddings""".stripMargin

  val oracles: Map[String, String] = Map(
    "all_neighbors_graph" -> allNeighborsGraphOracle,
    "cagra_optimize" -> cagraOptimizeOracle,
    "cagra_connected" -> cagraConnectedOracle,
    "connected_components" -> componentsOracle,
    "all_neighbors_recall" -> allNeighborsRecallOracle,
    "nn_descent_recall" -> nnDescentRecallOracle,
    "single_linkage" -> singleLinkageOracle,
    "mutual_reachability" -> mutualReachabilityOracle,
    "spectral_clustering" -> spectralOracle,
    "spectral_embedding" -> spectralEmbeddingOracle,
    "vamana_build" -> vamanaOracle,
    "cagra_search_recall" -> cagraSearchOracle,
    "cagra_search_cheap" -> cagraSearchCheapOracle,
    "cagra_ace_recall" -> cagraAceOracle,
    "cagra_extend_recall" -> cagraExtendOracle,
    "cagra_filtered_search" -> cagraFilteredOracle,
    "hnsw_levels" -> hnswLevelsOracle,
    "hnsw_search_recall" -> hnswSearchOracle,
    "hnsw_extend_recall" -> hnswExtendOracle,
  )
}
