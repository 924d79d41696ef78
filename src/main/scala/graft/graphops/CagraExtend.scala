package graft.graphops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.core.Metric

/** CAGRA graph `extend` — chunked insertion of new vectors into an existing
  * search graph (cagra.hpp:363-374 `extend_params.max_chunk_size`;
  * detail/cagra/add_nodes.cuh:24-280 `add_node_core`):
  *
  *  1. each chunk's vectors are batch-searched against the CURRENT graph at
  *     `base_degree = 2*degree` candidates (add_nodes.cuh:38,70-71: itopk
  *     widened to >= 2*base_degree);
  *  2. the candidate list is detour-pruned to `degree` out-edges per new
  *     node (add_nodes.cuh:150-189: candidate `a` is detourable when an
  *     earlier-ranked candidate `b` already links to `a` in the graph —
  *     rank-based reordering by detourable count, ties by search rank);
  *  3. reverse edges: each new node's top `degree/2` neighbors receive an
  *     edge back to the new node, force-replacing one of their TAIL slots
  *     (add_nodes.cuh:193-233: slots [degree/2, degree) are eligible — the
  *     head of an adjacency list is load-bearing for greedy descent, the
  *     tail is redundancy; the evicted slot is the one whose neighbor has
  *     the MOST incoming edges, i.e. the most redundant to drop), so every
  *     touched node stays exactly at `degree`;
  *  4. the new node's final list INTERLEAVES its rank-based list with the
  *     neighbors evicted in step 3 (add_nodes.cuh:236-274): the evicted
  *     edge target→e survives as the two-hop path target→new→e, so forced
  *     reverse edges never sever connectivity.
  *
  * Like the reference, no edges are added BETWEEN nodes of the same chunk
  * (cagra.hpp:367-370 documents the recall tradeoff); splitting the insert
  * into several chunks lets later chunks link to earlier ones.
  *
  * Scale shape: the base graph is checkpointed ONCE and never rewritten.
  * Each chunk accumulates only a touched-row OVERLAY — the replacement
  * adjacency for reverse-edge targets plus the new nodes' lists — and the
  * current graph is the lazy view `base ▷ touchedIds ∪ overlay` (a
  * broadcast anti-join at read time). With C chunks the loop materializes
  * C overlays of touched-row size instead of C copies of the full edge
  * list, so a 100 TB base graph is scanned by the chunk searches but never
  * re-stored; the view reconciles once, at the end.
  *
  * The extended graph feeds every downstream consumer of a (src, dst, dist)
  * edge list unchanged — GraphSearch traversal, Hnsw.fromGraph (HNSW
  * extend is exactly this + re-assigning levels for the new ids), and
  * InteropExport.
  */
object CagraExtend {

  case class Params(
      /** Hard cap on rows per insert chunk; 0 = one chunk for the whole
        * batch (cagra.hpp:365: auto). Chunks are id-ordered row ranges, so
        * every chunk holds <= maxChunkSize rows (the reference's
        * max_chunk_size is the same hard per-batch bound). */
      maxChunkSize: Int = 0,
      metric: Metric = Metric.L2Sqrt,
      /** Traversal width for the neighbor search; 0 = auto
        * (max(4*degree, 64), the reference's 2*base_degree floor scaled to
        * batch fixtures — add_nodes.cuh:71 uses max(2*base_degree, 256)). */
      itopk: Int = 0,
      maxIterations: Int = 10,
      searchWidth: Int = 4)

  /** Checkpoint + re-alias every column so the frame's attribute ids are
    * fresh. The chunk loop carves several union branches out of ONE
    * lineage (current graph -> candidates -> kept/evicted/reverse rows);
    * on the distributed search route those branches share attribute ids,
    * and Catalyst's Union constraint rewrite throws (AttributeMap "key not
    * found" under PruneFilters) when a shared id crosses branches. The
    * local-kernel route regenerates ids via createDataFrame, which is why
    * only the at-scale path trips it. */
  private def reid(df: DataFrame): DataFrame =
    df.select(df.columns.map(n => col(n).as(n)).toIndexedSeq: _*)

  private def ckptFresh(df: DataFrame): DataFrame = reid(df.localCheckpoint())

  /** graph: (src, dst, dist) with <= degree out-edges per node over `data`;
    * newRows: (idCol, vecCol) disjoint from `data`. Returns the extended
    * (src, dst, dist, rank) edge list over data ∪ newRows with <= degree
    * out-edges per node (touched + new nodes at exactly degree when the
    * graph can supply them).
    *
    * SESSION SIDE EFFECT: `spark.sql.constraintPropagation.enabled` is
    * set to false on this session for the duration of the build (see the
    * comment below) — other queries running concurrently on the same
    * session during a long extend are optimized without constraint
    * propagation (an inference-only, perf-neutral-here optimizer feature).
    * The override is ref-counted per session, so concurrent/nested extends
    * interleaving their save/restore can never strand the flag: the first
    * acquisition saves the user's value and only the last release restores
    * it. */
  def extend(graph: DataFrame, data: DataFrame, newRows: DataFrame, degree: Int,
      params: Params = Params(), idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val spark = graph.sparkSession
    // Catalyst's Union constraint rewrite throws (AttributeMap "key not
    // found" under PruneFilters) when the loop's base▷touched∪overlay view
    // is re-joined against itself by the distributed chunk search.
    // Constraint propagation is an optimizer inference only (extra
    // IsNotNull/filter derivation), so switch it off for the build and
    // restore after; the result is materialized before returning, so no
    // caller ever re-optimizes the loop's plans with it back on.
    graft.core.ConfGuard.withOverride(spark,
      "spark.sql.constraintPropagation.enabled", "false") {
      extendImpl(spark, graph, data, newRows, degree, params, idCol, vecCol)
    }
  }

  private def extendImpl(spark: org.apache.spark.sql.SparkSession, graph: DataFrame,
      data: DataFrame, newRows: DataFrame, degree: Int,
      params: Params, idCol: String, vecCol: String): DataFrame = {
    val baseDegree = 2 * degree
    val revCount = math.max(1, degree / 2)
    val itopk = if (params.itopk > 0) params.itopk else math.max(4 * degree, 64)
    val wRank = Window.partitionBy(col("src")).orderBy(col("dist").asc, col("dst").asc)

    // the base graph and dataset are materialized once and never rewritten
    val base = graph.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("dist").cast("double").as("dist"))
      .localCheckpoint()
    val baseData = data.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .localCheckpoint()

    val add = newRows.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val addCount = add.count()
    // empty insert batch: extend is a no-op (the reference returns the
    // input index unchanged) — materialize the ranked copy so the pinned
    // base checkpoint can be released before returning
    if (addCount == 0) {
      val out = ckptFresh(base.withColumn("rank", row_number().over(wRank)))
      graft.core.Frames.releaseCheckpoint(base)
      graft.core.Frames.releaseCheckpoint(baseData)
      return out
    }

    val chunkSize = if (params.maxChunkSize > 0) params.maxChunkSize.toLong else addCount
    val nChunks = ((addCount + chunkSize - 1) / chunkSize).toInt

    // Cost-based route (see LocalKernel): at fixture scale the chunk
    // loop's ~10 relational stages per chunk cost orders of magnitude
    // more in job scheduling than in compute — the same economics as
    // GraphSearch's broadcast kernel, resolved the same way. The kernel
    // replays the relational pipeline step for step with the same total
    // orderings, so the two routes return the SAME graph
    // (CagraExtendSuite route-equality spec). The gate limit-probes
    // (LocalKernel.within) instead of running two full-scan count() jobs
    // over a (potentially 100 TB) base per extend call.
    if (LocalKernel.enabled(spark) &&
        LocalKernel.within(base, LocalKernel.maxEdges(spark)) &&
        LocalKernel.within(baseData, LocalKernel.maxVectors(spark) - addCount)) {
      try return extendLocal(spark, base, baseData, add, degree, params, chunkSize)
      finally {
        // releaseCheckpoint, not unpersist: these are localCheckpoints,
        // whose blocks a plain Dataset.unpersist never frees
        graft.core.Frames.releaseCheckpoint(base)
        graft.core.Frames.releaseCheckpoint(baseData)
      }
    }

    // Hard-cap chunk assignment by id-ordered row range (the reference
    // chunks by row offset): range-repartition + in-partition sort puts the
    // batch in global id order without a single-partition stage, and
    // zipWithIndex turns that into the exact sorted position — chunk i is
    // rows [i*chunkSize, (i+1)*chunkSize), every chunk <= chunkSize rows,
    // deterministic for a given batch regardless of input partitioning.
    val chunks = {
      val ordered =
        if (nChunks == 1) add.withColumn("_chunk", lit(0))
        else {
          val sorted = add.repartitionByRange(col("id")).sortWithinPartitions("id")
          val sch = StructType(sorted.schema.fields :+ StructField("_chunk", IntegerType, false))
          val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
            Row.fromSeq(r.toSeq :+ (i / chunkSize).toInt)
          }
          spark.createDataFrame(rdd, sch)
        }
      ordered.localCheckpoint()
    }

    // Touched-row overlay: `overlay` carries the CURRENT adjacency for every
    // src in `touchedIds` (reverse-edge targets + inserted nodes); the live
    // graph/dataset are lazy views over the immutable base. The anti-join
    // side is EXPLICITLY broadcast: touched ids are bounded by
    // (revCount+1)·|insert batch| — the documented contract — and the hint
    // makes an oversized batch fail loudly at the broadcast size limit
    // instead of silently degrading to a per-chunk sort-merge anti-join
    // that shuffles the full base edge list.
    var overlay = spark.emptyDataFrame
    var touchedIds = spark.emptyDataFrame
    var haveOverlay = false
    def curGraph: DataFrame =
      if (!haveOverlay) base
      else base.join(broadcast(touchedIds), Seq("src"), "left_anti").unionByName(overlay)
    var insSoFar = spark.emptyDataFrame
    def curData: DataFrame =
      if (!haveOverlay) baseData else baseData.unionByName(insSoFar)

    var ci = 0
    while (ci < nChunks) {
      val chunk = chunks.filter(col("_chunk") === ci).select(col("id"), col("vec"))
      val cg = curGraph
      val cd = curData

      // Step 1 (add_nodes.cuh:100-120): batch-search the current graph for
      // each new vector's base_degree nearest current nodes.
      val cand = GraphSearch.search(
        cg.select(col("src"), col("dst")), cd,
        chunk.select(col("id").as("qid"), col("vec").as("qvec")),
        baseDegree,
        GraphSearch.Params(itopk = itopk, searchWidth = params.searchWidth,
          maxIterations = params.maxIterations, metric = params.metric))
        .select(col("qid").as("src"), col("nbr_id").as("dst"), col("rank"), col("dist"))
        .transform(ckptFresh)

      // Step 2 (add_nodes.cuh:150-189): detourable count of candidate `a` =
      // number of earlier-ranked candidates `b` whose adjacency already
      // contains `a`; keep the `degree` least-detourable (ties by rank).
      val adj = cg.select(col("src").as("_gs"), col("dst").as("_gd"))
      val det = cand.as("a")
        .join(cand.as("b"),
          col("a.src") === col("b.src") && col("b.rank") < col("a.rank"))
        .join(adj, col("_gs") === col("b.dst") && col("_gd") === col("a.dst"))
        .groupBy(col("a.src").as("src"), col("a.dst").as("dst"))
        .agg(count_distinct(col("b.dst")).as("detours"))
      val wNew = Window.partitionBy(col("src"))
        .orderBy(col("detours").asc, col("rank").asc, col("dst").asc)
      val newEdges = cand.join(det, Seq("src", "dst"), "left")
        .withColumn("detours", coalesce(col("detours"), lit(0L)))
        .withColumn("_rk", row_number().over(wNew))
        .filter(col("_rk") <= degree)
        .select(col("src"), col("dst"), col("dist"), col("_rk"))
        .transform(ckptFresh)

      // Step 3 (add_nodes.cuh:193-233): each new node's top degree/2
      // neighbors get a reverse edge, force-replacing a tail slot
      // [degree/2, degree). Only tailSlots reverse edges fit per target
      // (the reference's sequential pass lets later inserts evict earlier
      // same-chunk reverse edges; the relational analog keeps the closest
      // tailSlots new nodes per target — deterministic, same cap).
      val tailSlots = degree - degree / 2
      val wRev = Window.partitionBy(col("src")).orderBy(col("dist").asc, col("dst").asc)
      val rev = newEdges.filter(col("_rk") <= revCount)
        .select(col("dst").as("src"), col("src").as("dst"), col("dist"))
        .groupBy(col("src"), col("dst")).agg(min(col("dist")).as("dist"))
        .withColumn("_ri", row_number().over(wRev))
        .filter(col("_ri") <= tailSlots)
        .transform(ckptFresh)
      // Eviction (add_nodes.cuh:205-227): per target, the i-th reverse edge
      // evicts the tail-slot neighbor with the i-th most incoming edges —
      // redundancy, measured on the chunk-start graph (step 0's histogram).
      val inc = cg.groupBy(col("dst").as("_in")).agg(count(lit(1)).as("_ninc"))
      val revPerTarget = rev.groupBy(col("src")).agg(max(col("_ri")).as("_nrev"))
      val wSlot = Window.partitionBy(col("src")).orderBy(col("dist").asc, col("dst").asc)
      val touched = cg.join(revPerTarget, Seq("src"))
        .withColumn("_slot", row_number().over(wSlot))
      val headKept = touched.filter(col("_slot") <= degree / 2)
        .select(col("src"), col("dst"), col("dist"))
      val tail = touched.filter(col("_slot") > degree / 2)
        .join(inc, col("dst") === col("_in"), "left")
        .withColumn("_ninc", coalesce(col("_ninc"), lit(0L)))
      val wEvict = Window.partitionBy(col("src"))
        .orderBy(col("_ninc").desc, col("dst").asc)
      val tailRanked = tail.withColumn("_ei", row_number().over(wEvict))
      val tailKept = tailRanked.filter(col("_ei") > col("_nrev"))
        .select(col("src"), col("dst"), col("dist"))
      // Step 4 (add_nodes.cuh:236-274): the new node adopts each neighbor
      // its reverse edges evicted, interleaved with its rank-based list
      // (odd order = rank list, even = evictions), dedup'd, cut to degree.
      val evicted = tailRanked.filter(col("_ei") <= col("_nrev"))
        .select(col("src").as("_t"), col("_ei"), col("dst").as("_evicted"))
      val adopt = rev.select(col("dst").as("_nn"), col("src").as("_t"), col("_ri"))
        .join(evicted, Seq("_t")).filter(col("_ri") === col("_ei"))
        .filter(col("_nn") =!= col("_evicted"))
        .select(col("_nn").as("src"), col("_evicted").as("dst"),
          (col("_ri") * 2).as("_ord"))
      val ranked = newEdges.select(col("src"), col("dst"), (col("_rk") * 2 - 1).as("_ord"))
      val wAdopt = Window.partitionBy(col("src"), col("dst")).orderBy(col("_ord").asc)
      // dst tiebreak: two adopt rows can share an _ord (same _ri at two
      // targets) and a tied row_number is nondeterministic
      val wCut = Window.partitionBy(col("src")).orderBy(col("_ord").asc, col("dst").asc)
      val newAdj = ranked.unionByName(adopt)
        .withColumn("_dup", row_number().over(wAdopt)).filter(col("_dup") === 1)
        .withColumn("_pos", row_number().over(wCut)).filter(col("_pos") <= degree)
        .select(col("src"), col("dst"))
        // adopted edges need their true distance for downstream rank order
        .join(cd.select(col("id").as("dst"), col("vec").as("_dv")), "dst")
        .join(chunk.select(col("id").as("src"), col("vec").as("_sv")), "src")
        .select(col("src"), col("dst"), graft.functions.vector_distance(
          params.metric, col("_sv"), col("_dv")).cast("double").as("dist"))

      // Overlay update: replacement adjacency for this chunk's touched srcs
      // (reverse-edge targets keep head + surviving tail + forced reverse
      // rows; new nodes get their interleaved lists). Only these rows are
      // materialized — the base graph is never rewritten.
      val chunkAdj = reid(headKept)
        .unionByName(reid(tailKept))
        .unionByName(reid(rev.select(col("src"), col("dst"), col("dist"))))
        .unionByName(reid(newAdj))
        .localCheckpoint()
      val chunkTouched = revPerTarget.select(col("src"))
        .unionByName(chunk.select(col("id").as("src")))
      overlay =
        if (!haveOverlay) reid(chunkAdj)
        else ckptFresh(
          overlay.join(broadcast(chunkTouched), Seq("src"), "left_anti")
            .unionByName(chunkAdj))
      touchedIds = ckptFresh(
        if (!haveOverlay) chunkTouched
        else touchedIds.unionByName(reid(chunkTouched)).distinct())
      insSoFar = chunks.filter(col("_chunk") <= ci).select(col("id"), col("vec"))
      haveOverlay = true
      ci += 1
    }

    // the single end-of-build reconcile: materialize the view so every
    // consumer reads a plain edge list (and never re-optimizes the loop's
    // constraint-free plans); the result no longer depends on the pinned
    // base/dataset/chunk checkpoints, so release them (mirrors the
    // local-kernel route's unpersist)
    val out = ckptFresh(curGraph.withColumn("rank", row_number().over(wRank)))
    graft.core.Frames.releaseCheckpoint(base)
    graft.core.Frames.releaseCheckpoint(baseData)
    graft.core.Frames.releaseCheckpoint(chunks)
    out
  }

  /** In-memory twin of the relational chunk loop — every step keeps the
    * relational route's exact total orderings (detour/rank/dst prune cut,
    * dist/dst reverse-edge cap and slot order, in-degree-desc/dst
    * eviction, odd/even interleave cut by (ord, dst)), and entry seeds
    * come from the SAME Spark hash-pick expression, so both routes return
    * the same graph row for row. */
  private def extendLocal(spark: org.apache.spark.sql.SparkSession, base: DataFrame,
      baseData: DataFrame, add: DataFrame, degree: Int, params: Params,
      chunkSize: Long): DataFrame = {
    import spark.implicits._
    import java.util.{HashMap => JHashMap}
    import scala.collection.mutable.ArrayBuffer
    val distFn = graft.core.Distance.fn(params.metric)
    val minClose = Metric.isMinClose(params.metric)
    val baseDegree = 2 * degree
    val revCount = math.max(1, degree / 2)
    val tailSlots = degree - degree / 2
    val headN = degree / 2
    val itopk = if (params.itopk > 0) params.itopk else math.max(4 * degree, 64)
    val gsDefaults = GraphSearch.Params()

    val vecs = new JHashMap[Long, Array[Float]]()
    baseData.as[(Long, Array[Float])].collect().foreach { case (i, v) => vecs.put(i, v) }
    val adj = new JHashMap[Long, ArrayBuffer[(Long, Double)]]()
    base.as[(Long, Long, Double)].collect().foreach { case (s, d, w) =>
      var b = adj.get(s)
      if (b == null) { b = new ArrayBuffer[(Long, Double)](); adj.put(s, b) }
      b += ((d, w))
    }

    val addRows = add.as[(Long, Array[Float])].collect().sortBy(_._1)
    val nChunks = ((addRows.length + chunkSize - 1) / chunkSize).toInt

    var ci = 0
    while (ci < nChunks) {
      val chunk = addRows.slice((ci * chunkSize).toInt,
        math.min(addRows.length.toLong, (ci + 1) * chunkSize).toInt)

      // chunk-start adjacency ids + in-degree histogram (step 0)
      val adjIds = new JHashMap[Long, Array[Long]](adj.size * 2)
      val inc = new JHashMap[Long, Long]()
      adj.forEach { (s, lst) =>
        val arr = new Array[Long](lst.length)
        var i = 0
        while (i < lst.length) {
          arr(i) = lst(i)._1
          inc.merge(lst(i)._1, 1L, (a, b) => a + b)
          i += 1
        }
        adjIds.put(s, arr)
      }

      // entry seeds: the distributed route's hash-pick over the current
      // dataset ids, evaluated by the same Spark expression for parity
      val curIds = { val a = new ArrayBuffer[Long](vecs.size); vecs.forEach((k, _) => a += k); a }
      val picks = spark.createDataset(curIds.toIndexedSeq).toDF("id")
        .orderBy(xxhash64(col("id"), lit(gsDefaults.seed)), col("id"))
        .limit(gsDefaults.nSeeds).as[Long].collect()

      // steps 1+2: per new node, beam search to baseDegree candidates,
      // then detour-prune to degree by (detours, search rank, dst).
      // Per-node work is independent and only READS the chunk-start maps,
      // so it fans out over cores; results land by index — deterministic.
      val newLists = new Array[(Long, Array[Float], Seq[(Long, Double, Int)])](chunk.length)
      java.util.stream.IntStream.range(0, chunk.length).parallel().forEach { i =>
        val (nid, nvec) = chunk(i)
        val beam = LocalBeam.run(nvec, picks, adjIds, vecs, distFn,
          itopk, params.searchWidth, params.maxIterations)
        val cands = LocalBeam.topK(beam, baseDegree, minClose) // (id, rank, dist)
        val pruned = cands.map { case (cid, crank, cdist) =>
          var det = 0
          cands.foreach { case (bid, brank, _) =>
            if (brank < crank) {
              val e = adjIds.get(bid)
              if (e != null && e.contains(cid)) det += 1
            }
          }
          (cid, crank, cdist, det)
        }.sortBy { case (cid, crank, _, det) => (det, crank, cid) }
          .take(degree)
        newLists(i) = (nid, nvec, pruned.zipWithIndex.map { case ((cid, _, d, _), j) => (cid, d, j + 1) })
      }

      // step 3: reverse edges — each new node's top degree/2 neighbors,
      // capped at tailSlots per target by (dist, new-node id)
      val revByT = new JHashMap[Long, ArrayBuffer[(Long, Double)]]()
      newLists.foreach { case (nid, _, lst) =>
        lst.foreach { case (dst, d, rk) =>
          if (rk <= revCount) {
            var b = revByT.get(dst)
            if (b == null) { b = new ArrayBuffer[(Long, Double)](); revByT.put(dst, b) }
            b += ((nid, d))
          }
        }
      }
      val adoptBy = new JHashMap[Long, ArrayBuffer[(Long, Int)]]() // nn -> (evicted, ord)
      revByT.forEach { (t, lst) =>
        val kept = lst.sortBy { case (nn, d) => (d, nn) }.take(tailSlots) // _ri = idx+1
        val cur = Option(adj.get(t)).map(_.toIndexedSeq).getOrElse(IndexedSeq.empty)
          .sortBy { case (dst, d) => (d, dst) } // _slot order
        val head = cur.take(headN)
        val tailRanked = cur.drop(headN)
          .sortBy { case (dst, _) => (-inc.getOrDefault(dst, 0L), dst) } // _ei order
        val nrev = kept.length
        val evicted = tailRanked.take(nrev)
        val nl = new ArrayBuffer[(Long, Double)]()
        nl ++= head; nl ++= tailRanked.drop(nrev); nl ++= kept
        adj.put(t, nl)
        // step 4 pairing: reverse edge _ri adopts the tail slot it evicted
        var i = 0
        while (i < nrev && i < evicted.length) {
          val nn = kept(i)._1
          val e = evicted(i)._1
          if (e != nn) {
            var b = adoptBy.get(nn)
            if (b == null) { b = new ArrayBuffer[(Long, Int)](); adoptBy.put(nn, b) }
            b += ((e, 2 * (i + 1)))
          }
          i += 1
        }
      }

      // step 4: interleave rank list (odd ord) with adoptions (even ord),
      // dedup per dst keeping the smallest ord, cut to degree by (ord, dst)
      newLists.foreach { case (nid, nvec, lst) =>
        val byDst = scala.collection.mutable.Map.empty[Long, Int]
        lst.foreach { case (dst, _, rk) =>
          val o = 2 * rk - 1
          byDst.get(dst) match {
            case Some(p) if p <= o => ()
            case _ => byDst(dst) = o
          }
        }
        val ad = adoptBy.get(nid)
        if (ad != null) ad.foreach { case (dst, o) =>
          byDst.get(dst) match {
            case Some(p) if p <= o => ()
            case _ => byDst(dst) = o
          }
        }
        val fin = byDst.toSeq.sortBy { case (dst, o) => (o, dst) }.take(degree)
        val nl = new ArrayBuffer[(Long, Double)]()
        fin.foreach { case (dst, _) => nl += ((dst, distFn(nvec, vecs.get(dst)))) }
        adj.put(nid, nl)
      }

      // the chunk's vectors join the dataset only now — no intra-chunk
      // edges, exactly the relational loop's curData advance
      chunk.foreach { case (nid, nvec) => vecs.put(nid, nvec) }
      ci += 1
    }

    val rows = new ArrayBuffer[(Long, Long, Double, Int)]()
    adj.forEach { (s, lst) =>
      val sorted = lst.sortBy { case (d, w) => (w, d) }
      var i = 0
      while (i < sorted.length) {
        rows += ((s, sorted(i)._1, sorted(i)._2, i + 1))
        i += 1
      }
    }
    spark.createDataset(rows.toIndexedSeq).toDF("src", "dst", "dist", "rank")
  }
}
