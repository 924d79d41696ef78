package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.{Distance, Metric, VectorAgg}
import graft.expr.{CentroidSet, NearestCentroids}
import org.apache.spark.sql.graft.{bridge => B}

/** Lloyd's k-means over a DataFrame of vectors — semantics of
  * `cuvs::cluster::kmeans` (kmeans.hpp:37-146 params; fit :251, predict
  * :720, fit_predict :1222, transform :1497, cluster_cost :1537).
  *
  * Physical shape per iteration (the SURVEY.md §2.4 mapping):
  *   assign  = map-only NearestCentroids expression (broadcast centroids,
  *             no join, no shuffle) — the reference's tiled 1-NN assignment;
  *   update  = groupBy(cluster) fused vector-mean aggregator (one partial
  *             buffer per (cluster, partition) crosses the shuffle) — the
  *             reference's centroid update; its multi-GPU NCCL allreduce
  *             (kmeans.hpp:554-571) IS this shuffle.
  * Centroids (k x dim) collect to the driver each round — k ≤ a few K, so
  * this holds at any data scale; the data side is never collected.
  *
  * Determinism: init picks the k rows with smallest xxhash64(id, seed)
  * (reference pins RngState{0}, kmeans.hpp:89); empty clusters keep their
  * previous centroid.
  */
object KMeans {

  /** Centroid initialization — kmeans.hpp:62-69 InitMethod. */
  sealed trait Init
  /** Seeded uniform pick: k rows with smallest xxhash64(id, seed)
    * (InitMethod::Random; deterministic, and the historical default the
    * oracles replay). */
  case object RandomInit extends Init
  /** k-means|| oversampling (InitMethod::KMeansPlusPlus at scale) — see
    * [[plusPlusInit]]. */
  case object PlusPlusInit extends Init
  /** Caller-provided centroids (InitMethod::Array / params.centroids). */
  final case class ArrayInit(centroids: Array[Array[Float]]) extends Init

  /** nInit (kmeans.hpp n_init): independent seeded restarts; fit keeps the
    * lowest-inertia model (first wins ties, so the result is
    * deterministic).
    *
    * `trainsetCap` (0 = off) bounds the rows the Lloyd ITERATIONS see —
    * the absolute-cap form of the reference's `kmeans_trainset_fraction`
    * (ivf_flat.hpp:31-33) / `max_train_points_per_pq_code` (pq.hpp:97)
    * discipline: at fixed k, a fraction still grows the per-iteration
    * cost as n·k, while a cap keeps training flat in n and only the
    * final assignment/cost pass is O(n·k). The subset is a deterministic
    * hash pick, so results are reproducible and shuffle-free. */
  case class Params(k: Int, maxIter: Int = 20, tol: Double = 1e-4,
      seed: Long = 42, metric: Metric = Metric.L2, nInit: Int = 1,
      init: Init = RandomInit, trainsetCap: Long = 0)

  case class Model(centroids: CentroidSet, inertia: Double, iterations: Int) {
    def centroidArrays: Array[Array[Float]] = centroids.centroids
  }

  private[graft] def nearestCol(centroids: CentroidSet, vec: Column, p: Int): Column =
    B.column(NearestCentroids(B.expression(vec), centroids, p))

  /** (cluster, dist) of the nearest centroid for each row. */
  def assignCols(centroids: CentroidSet, vec: Column): (Column, Column) = {
    val nc = element_at(nearestCol(centroids, vec, 1), 1)
    (nc.getField("list_id"), nc.getField("dist"))
  }

  def fit(df: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec"): Model =
    if (params.nInit <= 1) fitOnce(df, params, idCol, vecCol)
    else (0 until params.nInit)
      .map(i => fitOnce(df, params.copy(seed = params.seed + i, nInit = 1), idCol, vecCol))
      .minBy(_.inertia)

  private def fitOnce(df: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec"): Model = {
    val data = df.select(col(idCol).as("_id"), col(vecCol).as("_vec"))
      .transform(graft.core.Frames.materialize(_))
    try {
      val dim = data.select(size(col("_vec"))).head().getInt(0)
      val initRows = params.init match {
        case ArrayInit(cs) =>
          require(cs.length == params.k,
            s"ArrayInit carries ${cs.length} centroids, k=${params.k}")
          require(cs.forall(_.length == dim), s"ArrayInit centroid dim != $dim")
          cs.map(_.clone())
        case PlusPlusInit => plusPlusInit(data, params, dim)
        case RandomInit =>
          // deterministic seeded init: k rows with smallest hash
          data.orderBy(xxhash64(col("_id"), lit(params.seed)), col("_id"))
            .limit(params.k)
            .select(col("_vec")).collect().map(_.getSeq[Float](0).toArray)
      }

      // iterations see at most trainsetCap rows (Params doc) on EVERY
      // route — the cap is semantics-bearing (it changes the trained
      // model), so it is applied before the kernel-route choice and a
      // pure perf conf can never change model contents. The final cost
      // pass below always sees every row.
      val (train, subsetted) = cappedTrainset(data, params)
      try {
        // Cost-based route (graft.graphops.LocalKernel): Lloyd's loop is
        // k·dim driver-side state and two jobs per iteration — on a
        // trainset small enough to collect, the iterations are pure
        // job-scheduling overhead. Same init (the Spark-computed hash pick
        // above), same strict-argmin assignment, same double-sum/mean
        // update, same tol/maxIter termination; the distributed loop below
        // is the at-scale path (the reference trains on a sampled fraction
        // for the same reason — kmeans.hpp trainset_fraction).
        val sparkS = df.sparkSession
        if (graft.graphops.LocalKernel.enabled(sparkS) &&
            graft.graphops.LocalKernel.within(train,
              graft.graphops.LocalKernel.maxVectors(sparkS))) {
          val m = fitLocal(train, initRows, dim, params)
          return if (subsetted)
            Model(m.centroids, clusterCost(data, m.centroids, "_vec"), m.iterations)
          else m
        }
        var centroids = pack(initRows, dim, params.metric)
        var it = 0
        var moved = Double.MaxValue
        while (it < params.maxIter && moved > params.tol) {
          val (cl, _) = assignCols(centroids, col("_vec"))
          val updated = train
            .groupBy(cl.as("cluster"))
            .agg(VectorAgg.vectorAvg(col("_vec")).as("mean"))
            .collect()
            .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
          val next = Array.tabulate(params.k) { c =>
            updated.get(c).filter(_.nonEmpty).getOrElse(centroids.centroid(c))
          }
          moved = next.zipWithIndex.map { case (v, c) =>
            Distance.l2Sqrt(v, centroids.centroid(c))
          }.max
          centroids = pack(next, dim, params.metric)
          it += 1
        }
        Model(centroids, clusterCost(data, centroids, "_vec"), it)
      } finally if (subsetted) train.unpersist()
    } finally data.unpersist()
  }

  /** Deterministic hash-capped trainset for the Lloyd iterations (see
    * Params.trainsetCap). Returns `data` itself when the cap is off or
    * not exceeded; else a materialized ~cap-row hash-picked subset and a
    * flag telling the caller to release it. */
  private def cappedTrainset(data: DataFrame, params: Params): (DataFrame, Boolean) =
    if (params.trainsetCap <= 0) (data, false)
    else {
      val n = data.count()
      if (n <= params.trainsetCap) (data, false)
      else {
        val den = 1000000L
        val num = math.max(1L, den * params.trainsetCap / n)
        (data.filter(pmod(xxhash64(col("_id"), lit(params.seed + 13)), lit(den)) < num)
          .transform(graft.core.Frames.materialize(_)), true)
      }
    }

  /** In-memory Lloyd over the collected trainset — the LocalKernel twin of
    * the distributed loop in fit(), sharing its Spark-computed init.
    * Vectors are summed in id order (a canonical order; the distributed
    * aggregation sums in partition order — same values up to fp
    * associativity). */
  private def fitLocal(data: DataFrame, initRows: Array[Array[Float]], dim: Int,
      params: Params): Model = {
    val rows = collectById(data).map(_._2)
    val distFn = Distance.fn(params.metric)
    val minClose = Metric.isMinClose(params.metric)
    var cents = initRows.map(_.clone())
    var it = 0
    var moved = Double.MaxValue
    val assign = new Array[Int](rows.length)
    val dists = new Array[Double](rows.length)
    while (it < params.maxIter && moved > params.tol) {
      assignLocal(rows, cents, distFn, minClose, assign, dists)
      val next = meansLocal(rows, assign, cents, dim, params.k)
      moved = next.zipWithIndex.map { case (v, c) => Distance.l2Sqrt(v, cents(c)) }.max
      cents = next
      it += 1
    }
    assignLocal(rows, cents, distFn, minClose, assign, dists)
    Model(pack(cents, dim, params.metric), dists.sum, it)
  }

  /** (id-sorted) collected trainset. */
  private def collectById(data: DataFrame): Array[(Long, Array[Float])] =
    data.select(col("_id").cast("long"), col("_vec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Strict-argmin assignment — CentroidOps.nearest p=1 semantics (first
    * index wins ties, IP flips direction). */
  private def assignLocal(rows: Array[Array[Float]], cents: Array[Array[Float]],
      distFn: (Array[Float], Array[Float]) => Double, minClose: Boolean,
      assign: Array[Int], dists: Array[Double]): Unit = {
    var i = 0
    while (i < rows.length) {
      var best = 0
      var bestD = distFn(rows(i), cents(0))
      var c = 1
      while (c < cents.length) {
        val d = distFn(rows(i), cents(c))
        if (if (minClose) d < bestD else d > bestD) { best = c; bestD = d }
        c += 1
      }
      assign(i) = best; dists(i) = bestD
      i += 1
    }
  }

  /** Per-cluster double-sum mean (VectorAvgAgg semantics); empty clusters
    * keep their previous centroid. */
  private def meansLocal(rows: Array[Array[Float]], assign: Array[Int],
      prev: Array[Array[Float]], dim: Int, k: Int): Array[Array[Float]] = {
    val sums = Array.fill(k)(new Array[Double](dim))
    val counts = new Array[Long](k)
    var i = 0
    while (i < rows.length) {
      val c = assign(i); val v = rows(i)
      var j = 0
      while (j < dim) { sums(c)(j) += v(j); j += 1 }
      counts(c) += 1
      i += 1
    }
    Array.tabulate(k) { c =>
      if (counts(c) == 0) prev(c)
      else { val out = new Array[Float](dim)
        var j = 0
        while (j < dim) { out(j) = (sums(c)(j) / counts(c)).toFloat; j += 1 }
        out }
    }
  }

  /** Balanced k-means — the reference's IVF trainer
    * (`cuvs::cluster::kmeans_balanced`; raft `adjust_centers`): after each
    * Lloyd update, clusters whose size fell below balanceRatio·(n/k) are
    * re-seeded onto the farthest-from-center points of the LARGEST cluster
    * (deterministic (dist desc, id) pick), splitting heavy cells and
    * reviving starved ones — the IVF list-size equalizer. The adjustment
    * is one distributed top-|small| per round; everything else is the
    * plain fit loop.
    */
  def fitBalanced(df: DataFrame, params: Params, balanceRatio: Double = 0.25,
      idCol: String = "id", vecCol: String = "vec"): Model = {
    val data = df.select(col(idCol).as("_id"), col(vecCol).as("_vec"))
      .transform(graft.core.Frames.materialize(_))
    try {
      val dim = data.select(size(col("_vec"))).head().getInt(0)
      val n = data.count()
      val floor = balanceRatio * n / params.k
      val initRows = data
        .orderBy(xxhash64(col("_id"), lit(params.seed)), col("_id"))
        .limit(params.k)
        .select(col("_vec")).collect().map(_.getSeq[Float](0).toArray)

      // iterations (and the size floor they balance against) see at most
      // trainsetCap rows ON EVERY ROUTE (the cap is semantics-bearing, so
      // it precedes the kernel-route choice); the final cost pass sees
      // every row. The floor is proportional (balanceRatio·n/k), so
      // balancing the subset balances the population it represents.
      val (train, subsetted) = cappedTrainset(data, params)
      try {
      val trainN = if (subsetted) train.count() else n
      val floorT = if (subsetted) balanceRatio * trainN / params.k else floor

      // LocalKernel route — same economics and mirrored semantics as
      // fitLocal, plus the reseed/adjust logic (see fitBalancedLocal).
      val sparkS = df.sparkSession
      if (graft.graphops.LocalKernel.enabled(sparkS) &&
          trainN <= graft.graphops.LocalKernel.maxVectors(sparkS)) {
        val m = fitBalancedLocal(train, initRows, dim, params, floorT)
        return if (subsetted)
          Model(m.centroids, clusterCost(data, m.centroids, "_vec"), m.iterations)
        else m
      }

      var centroids = pack(initRows, dim, params.metric)
      var it = 0
      var moved = Double.MaxValue
      while (it < params.maxIter && moved > params.tol) {
        val (cl, d) = assignCols(centroids, col("_vec"))
        val assigned = train.select(col("_id"), col("_vec"),
          cl.as("cluster"), d.as("_d"))
        val stats = assigned
          .groupBy(col("cluster"))
          .agg(VectorAgg.vectorAvg(col("_vec")).as("mean"), count(lit(1)).as("n"))
          .collect()
          .map(r => r.getInt(0) -> (r.getSeq[Float](1).toArray, r.getLong(2))).toMap
        val next = Array.tabulate(params.k) { c =>
          stats.get(c).map(_._1).filter(_.nonEmpty).getOrElse(centroids.centroid(c))
        }
        val sizes = Array.tabulate(params.k)(c => stats.get(c).map(_._2).getOrElse(0L))
        val small = sizes.indices.filter(sizes(_) < floorT)
        if (small.nonEmpty) {
          val biggest = sizes.indices.maxBy(c => (sizes(c), c))
          val donors = assigned.filter(col("cluster") === biggest)
            .orderBy(col("_d").desc, col("_id"))
            .limit(small.length)
            .select(col("_vec")).collect().map(_.getSeq[Float](0).toArray)
          small.zip(donors).foreach { case (c, v) => next(c) = v }
          moved = Double.MaxValue // keep iterating after a reseed
        } else {
          moved = next.zipWithIndex.map { case (v, c) =>
            Distance.l2Sqrt(v, centroids.centroid(c))
          }.max
        }
        centroids = pack(next, dim, params.metric)
        it += 1
      }
      // Terminal floor guarantee: the loop above can exit right after a
      // reseed — or after the Lloyd re-center that follows one — with a
      // cluster still below the floor. Finish with adjust-only rounds
      // (reseed WITHOUT re-centering, which cannot re-starve a cluster)
      // until every cluster meets the floor, bounded.
      var extra = 0
      var settled = false
      while (!settled && extra < 10) {
        val (cl, d) = assignCols(centroids, col("_vec"))
        val assigned = train.select(col("_id"), col("_vec"), cl.as("cluster"), d.as("_d"))
        val counts = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val sizes = Array.tabulate(params.k)(c => counts.getOrElse(c, 0L))
        val small = sizes.indices.filter(sizes(_) < floorT)
        if (small.isEmpty) settled = true
        else {
          val biggest = sizes.indices.maxBy(c => (sizes(c), c))
          val donors = assigned.filter(col("cluster") === biggest)
            .orderBy(col("_d").desc, col("_id"))
            .limit(small.length)
            .select(col("_vec")).collect().map(_.getSeq[Float](0).toArray)
          val next = Array.tabulate(params.k)(centroids.centroid)
          small.zip(donors).foreach { case (c, v) => next(c) = v }
          centroids = pack(next, dim, params.metric)
          extra += 1
        }
      }
      Model(centroids, clusterCost(data, centroids, "_vec"), it + extra)
      } finally if (subsetted) train.unpersist()
    } finally data.unpersist()
  }

  /** In-memory twin of fitBalanced's distributed loop: Lloyd + the
    * adjust_centers reseed (small clusters re-seeded onto the farthest
    * points of the largest cluster, (dist desc, id asc) pick), then the
    * terminal adjust-only rounds that guarantee the floor at return. */
  private def fitBalancedLocal(data: DataFrame, initRows: Array[Array[Float]], dim: Int,
      params: Params, floor: Double): Model = {
    val rows = collectById(data)
    val vecs = rows.map(_._2)
    val distFn = Distance.fn(params.metric)
    val minClose = Metric.isMinClose(params.metric)
    val assign = new Array[Int](rows.length)
    val dists = new Array[Double](rows.length)

    def sizesOf(): Array[Long] = {
      val s = new Array[Long](params.k)
      assign.foreach(c => s(c) += 1)
      s
    }
    def donorsOf(sizes: Array[Long], nDonors: Int): Array[Array[Float]] = {
      val biggest = sizes.indices.maxBy(c => (sizes(c), c))
      rows.indices.filter(assign(_) == biggest)
        .sortBy(i => (-dists(i), rows(i)._1))
        .take(nDonors).map(i => vecs(i)).toArray
    }

    var cents = initRows.map(_.clone())
    var it = 0
    var moved = Double.MaxValue
    while (it < params.maxIter && moved > params.tol) {
      assignLocal(vecs, cents, distFn, minClose, assign, dists)
      val next = meansLocal(vecs, assign, cents, dim, params.k)
      val sizes = sizesOf()
      val small = sizes.indices.filter(sizes(_) < floor)
      if (small.nonEmpty) {
        small.zip(donorsOf(sizes, small.length)).foreach { case (c, v) => next(c) = v.clone() }
        moved = Double.MaxValue
      } else {
        moved = next.zipWithIndex.map { case (v, c) => Distance.l2Sqrt(v, cents(c)) }.max
      }
      cents = next
      it += 1
    }
    var extra = 0
    var settled = false
    while (!settled && extra < 10) {
      assignLocal(vecs, cents, distFn, minClose, assign, dists)
      val sizes = sizesOf()
      val small = sizes.indices.filter(sizes(_) < floor)
      if (small.isEmpty) settled = true
      else {
        small.zip(donorsOf(sizes, small.length)).foreach { case (c, v) => cents(c) = v.clone() }
        extra += 1
      }
    }
    assignLocal(vecs, cents, distFn, minClose, assign, dists)
    Model(pack(cents, dim, params.metric), dists.sum, it + extra)
  }

  /** Adds `cluster` (and `dist` to its centroid) — kmeans.hpp predict. */
  def predict(df: DataFrame, centroids: CentroidSet, vecCol: String = "vec"): DataFrame = {
    val (cl, d) = assignCols(centroids, col(vecCol))
    df.withColumn("cluster", cl).withColumn("dist", d)
  }

  def fitPredict(df: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec"): (Model, DataFrame) = {
    val m = fit(df, params, idCol, vecCol)
    (m, predict(df, m.centroids, vecCol))
  }

  /** Distances to ALL centroids in centroid order — kmeans.hpp transform. */
  def transform(df: DataFrame, centroids: CentroidSet, vecCol: String = "vec"): DataFrame = {
    val nearestAll = nearestCol(centroids, col(vecCol), centroids.k)
    // re-order the (list_id, dist) pairs into positional centroid order
    df.withColumn("_nc", nearestAll)
      .withColumn("dists", transform_keys_placeholder(col("_nc"), centroids.k))
      .drop("_nc")
  }

  private def transform_keys_placeholder(nc: Column, k: Int): Column =
    org.apache.spark.sql.functions.transform(sequence(lit(0), lit(k - 1)), i =>
      element_at(org.apache.spark.sql.functions.filter(nc,
        s => s.getField("list_id") === i), 1).getField("dist"))

  /** Sum of distances to the nearest centroid — kmeans.hpp cluster_cost. */
  /** k-means|| init (Bahmani et al., VLDB 2012) — the distributed analog
    * of the k-means++ the reference defaults to (kmeans.hpp:62-69; its
    * init_size subsampling, kmeans.hpp:119-135, is the same
    * oversample-then-reduce idea). Each round samples candidates with
    * probability min(1, l·cost(x,C)/φ) where l = 2k, using a seeded hash
    * as the uniform draw — deterministic and partition-order-free. The
    * ≤ 1 + rounds·l expected candidates are weighted by their assignment
    * counts and reduced to exactly k by a driver-side weighted k-means++
    * pass. Only candidate vectors ever reach the driver; the data side
    * stays distributed. */
  private def plusPlusInit(data: DataFrame, params: Params, dim: Int): Array[Array[Float]] = {
    // Cost-based route (graft.graphops.LocalKernel): the distributed
    // oversampling pays 2 jobs PER ROUND (the phi aggregate, then the
    // filtered candidate collect) plus the final weighting job — ~10 jobs
    // whose data is k·dim floats. On a collectable trainset the same
    // seeded-hash draws run in memory off ONE collect: the same candidate
    // rule (u(r) < d²·l/φ with u(r) the xxhash64-derived uniform — XXH64
    // replayed via the catalyst implementation, type-aware on the id), the
    // same lexicographic candidate order, the same count-weighted
    // reduction. The distributed loop below is the at-scale path.
    val sparkL = data.sparkSession
    val idType = data.schema("_id").dataType
    val integral = idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType
    if (graft.graphops.LocalKernel.enabled(sparkL) && integral &&
        graft.graphops.LocalKernel.within(data,
          graft.graphops.LocalKernel.maxVectors(sparkL)))
      return plusPlusInitLocal(collectById(data),
        idType == org.apache.spark.sql.types.IntegerType, params)
    val k = params.k
    var cands: Array[Array[Float]] = Array(
      data.orderBy(xxhash64(col("_id"), lit(params.seed)), col("_id"))
        .limit(1).select(col("_vec")).head().getSeq[Float](0).toArray)
    val l = 2.0 * k
    val rounds = 4
    val uniform = (r: Int) =>
      (abs(xxhash64(col("_id"), lit(params.seed + r))) % 1000000007L)
        .cast("double") / 1000000007.0
    var r = 1
    while (r <= rounds && cands.length < 1 + rounds * 2 * k) {
      val cs = pack(cands, dim, params.metric)
      val (_, d) = assignCols(cs, col("_vec"))
      val scored = data.withColumn("_d2", d)
      val phi = scored.agg(sum(col("_d2"))).head().getDouble(0)
      if (phi <= 0) r = rounds // every row coincides with a candidate
      else cands = cands ++ scored
        .filter(uniform(r) < col("_d2") * l / phi)
        .select(col("_vec")).collect().map(_.getSeq[Float](0).toArray)
      r += 1
    }
    if (cands.length <= k) {
      // degenerate oversample (tiny or duplicate-heavy data): top up with
      // the seeded uniform pick, dedup-first so the padding adds spread
      val pad = data.orderBy(xxhash64(col("_id"), lit(params.seed)), col("_id"))
        .limit(k).select(col("_vec")).collect().map(_.getSeq[Float](0).toArray)
      return (cands ++ pad).distinctBy(_.toSeq).padTo(k, cands.head).take(k)
    }
    // Sort candidates lexicographically before the sequential weighted pass:
    // the sampled SET is partition-order-free but collect() order is not, and
    // weightedPlusPlus's index-weighted draws depend on array order.
    cands = cands.sortWith((a, b) => java.util.Arrays.compare(a, b) < 0)
    // weight candidates by how many rows they'd absorb, reduce to k
    val cs = pack(cands, dim, params.metric)
    val (cl, _) = assignCols(cs, col("_vec"))
    val counts = data.groupBy(cl.as("_c")).agg(count(lit(1)).as("_n"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    val w = Array.tabulate(cands.length)(i => counts.getOrElse(i, 0L).toDouble)
    weightedPlusPlus(cands, w, k, params.seed, params.metric)
  }

  /** xxhash64(idCol, lit(seed2)) replayed locally: catalyst's XxHash64
    * folds left from seed 42, hashing each child by its physical type —
    * so the id hashes as int or long exactly as the column would. */
  private def xxh2(id: Long, idIsInt: Boolean, seed2: Long): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val h1 = if (idIsInt) XXH64.hashInt(id.toInt, 42L) else XXH64.hashLong(id, 42L)
    XXH64.hashLong(seed2, h1)
  }

  /** In-memory twin of the distributed k-means|| oversampling below —
    * same seeded draws, same candidate multiset, same weighted reduction;
    * rows arrive id-sorted from collectById so every scan order is
    * canonical. */
  private def plusPlusInitLocal(rows: Array[(Long, Array[Float])], idIsInt: Boolean,
      params: Params): Array[Array[Float]] = {
    val k = params.k
    val distFn = Distance.fn(params.metric)
    val minClose = Metric.isMinClose(params.metric)
    val vecs = rows.map(_._2)
    def seededOrder: Array[Array[Float]] = rows
      .map(r => ((xxh2(r._1, idIsInt, params.seed), r._1), r._2))
      .sortBy(_._1).map(_._2)
    val first = seededOrder.head
    var cands = scala.collection.mutable.ArrayBuffer(first.clone())
    val l = 2.0 * k
    val rounds = 4
    val assign = new Array[Int](rows.length)
    val d2 = new Array[Double](rows.length)
    var r = 1
    while (r <= rounds && cands.length < 1 + rounds * 2 * k) {
      assignLocal(vecs, cands.toArray, distFn, minClose, assign, d2)
      val phi = d2.sum
      if (phi <= 0) r = rounds
      else {
        var i = 0
        while (i < rows.length) {
          val u = (math.abs(xxh2(rows(i)._1, idIsInt, params.seed + r)) % 1000000007L)
            .toDouble / 1000000007.0
          if (u < d2(i) * l / phi) cands += vecs(i).clone()
          i += 1
        }
      }
      r += 1
    }
    if (cands.length <= k) {
      val pad = seededOrder.take(k)
      return (cands.toArray ++ pad).distinctBy(_.toSeq).padTo(k, cands.head).take(k)
    }
    val arr = cands.toArray.sortWith((a, b) => java.util.Arrays.compare(a, b) < 0)
    assignLocal(vecs, arr, distFn, minClose, assign, d2)
    val w = new Array[Double](arr.length)
    assign.foreach(c => w(c) += 1.0)
    weightedPlusPlus(arr, w, k, params.seed, params.metric)
  }

  /** Driver-side weighted k-means++ over the candidate set (standard
    * final step of k-means||): sequential D²-weighted draws with a seeded
    * RNG. */
  private def weightedPlusPlus(cands: Array[Array[Float]], w: Array[Double], k: Int,
      seed: Long, metric: Metric): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val distFn = Distance.fn(metric)
    val n = cands.length
    def draw(p: Array[Double]): Int = {
      val tot = p.sum
      if (tot <= 0) return rnd.nextInt(n)
      var x = rnd.nextDouble() * tot
      var i = 0
      while (i < n - 1 && x > p(i)) { x -= p(i); i += 1 }
      i
    }
    val chosen = scala.collection.mutable.ArrayBuffer(cands(draw(w)))
    val minD = Array.fill(n)(Double.MaxValue)
    while (chosen.length < k) {
      val last = chosen.last
      var i = 0
      while (i < n) {
        minD(i) = math.min(minD(i), math.max(0.0, distFn(cands(i), last))); i += 1
      }
      chosen += cands(draw(Array.tabulate(n)(i => w(i) * minD(i))))
    }
    chosen.toArray
  }

  def clusterCost(df: DataFrame, centroids: CentroidSet, vecCol: String = "vec"): Double = {
    val (_, d) = assignCols(centroids, col(vecCol))
    df.agg(sum(d)).head().getDouble(0)
  }

  private def pack(cs: Array[Array[Float]], dim: Int, metric: Metric): CentroidSet = {
    val flat = new Array[Float](cs.length * dim)
    cs.zipWithIndex.foreach { case (v, i) =>
      System.arraycopy(v, 0, flat, i * dim, dim)
    }
    CentroidSet(flat, cs.length, dim, metric.name)
  }
}
