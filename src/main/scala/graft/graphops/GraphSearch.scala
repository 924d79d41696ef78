package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Metric
import graft.ops.BruteForceKnn

/** Batch greedy best-first graph traversal — CAGRA search semantics
  * (cagra.hpp:269-355: itopk_size, search_width, random seed points;
  * detail/cagra/search_plan.cuh:99-133) re-expressed as an iterative
  * frontier join, valid for *bulk* query batches (SURVEY.md §2.3: for most
  * batch workloads IVF/brute top-k is the better Spark plan; this operator
  * closes the semantic surface and serves Vamana/HNSW/CAGRA graphs alike).
  *
  * State per round: a single beam DataFrame (qid, id, dist, expanded)
  * capped at itopk rows per query. Each round expands the searchWidth best
  * unexpanded beam entries against the edge list, scores the new frontier
  * (distance to the query vector), and re-top-ks the beam — exactly one
  * Spark job per round. Runs a fixed maxIterations rounds (a converged
  * query's frontier is empty, so its late rounds are no-ops). All state is
  * O(queries · itopk) — the graph never shuffles, query state broadcasts.
  */
object GraphSearch {

  case class Params(itopk: Int = 40, searchWidth: Int = 4, maxIterations: Int = 10,
      nSeeds: Int = 8, seed: Long = 42, metric: Metric = Metric.L2)

  /** (qid, nbr_id, rank, dist) top-k per query via graph traversal.
    * `entrySeeds` (qid, id) overrides the pseudo-random entry points —
    * the HNSW upper-layer descent hands its per-query best down here. */
  def search(graph: DataFrame, dataset: DataFrame, queries: DataFrame, k: Int,
      params: Params, idCol: String = "id", vecCol: String = "vec",
      qidCol: String = "qid", qvecCol: String = "qvec",
      entrySeeds: Option[DataFrame] = None): DataFrame = {
    // Frames.materialize, not bare persist: an input checkpointed over an
    // aliased-away partitioning (spark.range sources) crashes the cache
    // manager on reuse — see graft.core.Frames. OWNERSHIP: an input the
    // caller already cached is used as-is and never unpersisted here — a
    // caller looping over searches (HNSW per-level descent, extend chunk
    // loop) must not pay a full cache populate+drop of the dataset per
    // call (measured 130 s/call at 1M before this).
    def shaped(df: DataFrame, cols: DataFrame => DataFrame): (DataFrame, Boolean) = {
      val own = df.storageLevel == StorageLevel.NONE
      val s = cols(df)
      (if (own) graft.core.Frames.materialize(s) else s, own)
    }
    val (data, ownData) = shaped(dataset,
      _.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec")))
    val (q, ownQ) = shaped(queries,
      _.select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("qvec")))
    val (edges, ownEdges) = shaped(graph,
      _.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
    def release(): Unit = {
      if (ownData) data.unpersist()
      if (ownQ) q.unpersist()
      if (ownEdges) edges.unpersist()
    }

    // Cost-based route (see LocalKernel): a graph small enough to broadcast
    // runs the whole traversal in one pass instead of maxIterations jobs.
    // Both routes return the same rows — LocalBeam mirrors this loop
    // round-for-round.
    val sparkS = dataset.sparkSession
    if (LocalKernel.enabled(sparkS) &&
        LocalKernel.within(edges, LocalKernel.maxEdges(sparkS)) &&
        LocalKernel.within(data, LocalKernel.maxVectors(sparkS))) {
      try return searchLocal(data, q, edges, k, params, entrySeeds)
      finally release()
    }

    // per-query state is O(queries·itopk) — always the broadcast side.
    // (localCheckpoint'ed frames report unknown stats, so without explicit
    // hints every per-round join would plan as a full shuffle join.)
    def score(cand: DataFrame): DataFrame = data
      .join(broadcast(cand), "id")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("id"),
        graft.functions.vector_distance(params.metric, col("qvec"), col("vec")).as("dist"))

    // seeded pseudo-random entry points (cagra random seeds): the nSeeds
    // nodes with smallest hashed id — one tiny global top-n, no shuffle of
    // the node set, shared across queries
    val seeds = entrySeeds.getOrElse {
      val picks = data.select(col("id"))
        .orderBy(xxhash64(col("id"), lit(params.seed)), col("id"))
        .limit(params.nSeeds)
      q.select(col("qid")).crossJoin(picks)
    }.select(col("qid").cast("long").as("qid"), col("id").cast("long").as("id")).distinct()

    var beam = score(seeds).withColumn("expanded", lit(false)).localCheckpoint()

    // One Spark job per round (the eager localCheckpoint). No visited-set
    // state: candidates already in the beam are anti-joined away, and a
    // candidate worse than the itopk-th entry falls out in the re-top-k.
    // A displaced node that gets re-proposed is merely re-scored; rounds
    // are bounded by maxIterations, so no termination action is needed.
    // AQE is suspended for the loop — its per-shuffle materialization adds
    // latency on the tiny per-round state and has nothing to re-plan.
    // ref-counted override (ConfGuard): concurrent searches on one session
    // (e.g. two extends' chunk loops) must not interleave a plain
    // save/restore and strand AQE off for the session
    val spark = dataset.sparkSession
    graft.core.ConfGuard.acquire(spark, "spark.sql.adaptive.enabled", "false")
    try {
      // rank among unexpanded entries: one window serves both the frontier
      // pick and the expanded-marking (no extra join against the frontier)
      val wf = Window.partitionBy(col("qid"), col("expanded"))
        .orderBy(col("dist").asc, col("id").asc)
      val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("id").asc)
      // The loop also exits when every beam entry is expanded: the
      // frontier is empty and will stay empty, so remaining rounds are
      // provable no-ops (LocalBeam's empty-frontier guard, mirrored) —
      // rows are identical to running out the full bound, only the jobs
      // are saved. This is what makes an ef-tracking round bound
      // affordable on the distributed path: the job count follows the
      // beam's actual drain, not the worst-case bound. The probe is one
      // tiny scan of the checkpointed O(queries·itopk) state.
      var it = 0
      while (it < params.maxIterations && !beam.filter(!col("expanded")).isEmpty) {
        val ranked = beam.withColumn("_rk", row_number().over(wf))
        val frontier = ranked
          .filter(!col("expanded") && col("_rk") <= params.searchWidth)
          .select(col("qid"), col("id"))
        val newCand = edges
          .join(broadcast(frontier), frontier("id") === edges("src"))
          .select(col("qid"), col("dst").as("id")).distinct()
          .join(broadcast(beam.select(col("qid"), col("id"))), Seq("qid", "id"), "left_anti")
        val scored = score(newCand).withColumn("expanded", lit(false))
        val marked = ranked
          .select(col("qid"), col("id"), col("dist"),
            (col("expanded") || col("_rk") <= params.searchWidth).as("expanded"))
        beam = marked.unionByName(scored)
          .withColumn("_rk", row_number().over(w))
          .filter(col("_rk") <= params.itopk)
          .drop("_rk")
          .localCheckpoint()
        it += 1
      }
    } finally graft.core.ConfGuard.release(spark, "spark.sql.adaptive.enabled")
    release()
    BruteForceKnn.topKPerQuery(
      beam.select(col("qid"), col("id").as("_nid"), col("dist")), k, params.metric)
  }

  /** Filtered traversal — CAGRA `sample_filter` + `filtering_rate`
    * (cagra.hpp:348-355,1548-1559): nodes outside `allow` never enter the
    * RESULT, while the walk itself still crosses them (filtering must not
    * disconnect the graph). The reference widens its internal lists by the
    * filter rate and drops filtered candidates at collection; the batch
    * analog widens itopk/k by 1/(1-rate) (rate auto-calculated from
    * |allow|/|dataset| when not given, as the reference does), traverses
    * once, then semi-joins the allow-list and re-ranks to k. */
  def searchFiltered(graph: DataFrame, dataset: DataFrame, queries: DataFrame, k: Int,
      params: Params, allow: DataFrame,
      idCol: String = "id", vecCol: String = "vec",
      qidCol: String = "qid", qvecCol: String = "qvec",
      filteringRate: Double = -1.0): DataFrame = {
    // distinct: a duplicated allow row (e.g. from an upstream join) must
    // not understate the rate and silently skip the beam widening
    val allowIds = allow.select(col(idCol).cast("long").as("id")).distinct()
    val rate =
      if (filteringRate >= 0) filteringRate
      else {
        // The at-scale contract is the explicit hint — the reference
        // treats filtering_rate as user-supplied (cagra.hpp:355). The
        // auto-estimate must not full-scan the big side: count only the
        // allow-list (the small side), take |dataset| from catalog/cached
        // plan stats when known, else probe the dataset scan and STOP at
        // 20x|allow| rows — past that point the keep-clamp below pins the
        // widening at its 0.05 floor regardless of the exact count, so
        // the probe's work is bounded by the small side either way.
        val nAllow = math.max(1L, allowIds.count())
        val nData: Double =
          dataset.queryExecution.optimizedPlan.stats.rowCount match {
            case Some(rc) => rc.toDouble
            case None =>
              val cap = 20L * nAllow
              LocalKernel.countUpTo(dataset.select(col(idCol)), cap).toDouble
          }
        1.0 - nAllow.toDouble / math.max(nAllow.toDouble, nData)
      }
    // clamp to [0.05, 1]: cap the widening at 20x, and never NARROW the
    // beam when allow covers (or out-of-dataset ids overcount) the dataset
    val keep = math.min(1.0, math.max(0.05, 1.0 - rate))
    val widened = params.copy(itopk = math.ceil(params.itopk / keep).toInt)
    // the full widened beam is already scored — return all of it and cut
    // to k after the filter, so a locally-dense deny region can't shorten
    // a result list that the beam actually covered
    val raw = search(graph, dataset, queries, widened.itopk, widened,
      idCol, vecCol, qidCol, qvecCol)
    val ord = if (Metric.isMinClose(params.metric)) col("dist").asc else col("dist").desc
    val w = Window.partitionBy(col("qid")).orderBy(ord, col("nbr_id").asc)
    raw.join(allowIds.withColumnRenamed("id", "nbr_id"), Seq("nbr_id"), "left_semi")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nbr_id"), col("rank"), col("dist"))
  }

  /** Broadcast route: graph + vectors collected once and broadcast; the
    * query side streams through a single mapPartitions (never collected, so
    * the QUERY set may be arbitrarily large). Row-identical to the
    * iterative loop — LocalBeam documents the mirrored semantics. */
  private def searchLocal(data: DataFrame, q: DataFrame, edges: DataFrame, k: Int,
      params: Params, entrySeeds: Option[DataFrame]): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val vecs = new java.util.HashMap[Long, Array[Float]]()
    data.as[(Long, Array[Float])].collect().foreach { case (i, v) => vecs.put(i, v) }
    val adj = LocalBeam.buildAdj(edges.as[(Long, Long)].collect())
    val bcVecs = spark.sparkContext.broadcast(vecs)
    val bcAdj = spark.sparkContext.broadcast(adj)
    val metric = params.metric
    val (itopk, sw, iters) = (params.itopk, params.searchWidth, params.maxIterations)
    val minClose = Metric.isMinClose(metric)

    val seeded: org.apache.spark.sql.Dataset[(Long, Array[Float], Array[Long])] =
      entrySeeds match {
        case Some(es) =>
          // per-query seed lists ride the query rows (same join the
          // distributed route's score() performs)
          val s = es.select(col("qid").cast("long").as("qid"), col("id").cast("long").as("id"))
            .distinct()
            .groupBy(col("qid")).agg(collect_list(col("id")).as("_seeds"))
          q.join(s, "qid").select(col("qid"), col("qvec"), col("_seeds"))
            .as[(Long, Array[Float], Array[Long])]
        case None =>
          // shared pseudo-random entry points — same tiny global pick
          val picks = data.select(col("id"))
            .orderBy(xxhash64(col("id"), lit(params.seed)), col("id"))
            .limit(params.nSeeds).as[Long].collect()
          q.as[(Long, Array[Float])].map { case (qid, qv) => (qid, qv, picks) }
      }

    seeded.flatMap { case (qid, qvec, seeds) =>
      val beam = LocalBeam.run(qvec, seeds, bcAdj.value, bcVecs.value,
        graft.core.Distance.fn(metric), itopk, sw, iters)
      LocalBeam.topK(beam, k, minClose).map { case (id, rank, dist) => (qid, id, rank, dist) }
    }.toDF("qid", "nbr_id", "rank", "dist")
  }
}
