package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, count, lit, pmod, sqrt, when, xxhash64}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.apache.spark.sql.graft.{bridge => B}
import graft.core.Metric
import graft.ops.BruteForceKnn

/** Declarative kNN join as a Catalyst node — the v2 optimizer step from
  * the round-1 plan: users state WHAT (`knn_join(data, queries, k,
  * metric)`), the optimizer picks HOW.
  *
  * `KnnJoinPlan` is a logical `BinaryNode` carrying only semantics
  * (k, metric, column names) and a fixed output schema
  * (qid, nbr_id, rank, dist). `ResolveKnnJoin` — installed through
  * `SparkSessionExtensions` (GraftExtensions) — lowers it during
  * optimization into the partial-top-k aggregation pipeline
  * (BruteForceKnn: per-partition bounded-heap select_k, merge on qid;
  * shuffle bytes O(q·k·partitions) regardless of data size, the
  * reference's tiled select_k + knn_merge_parts shape). The rewrite
  * re-aliases the produced attributes onto the node's declared exprIds so
  * enclosing plans (filters, joins, projections over the kNN output)
  * survive untouched — downstream operators compose with it like with any
  * relational node, and Catalyst pushes its own optimizations around it.
  */
case class KnnJoinPlan(
    left: LogicalPlan,  // data: (idCol, vecCol, ...)
    right: LogicalPlan, // queries: (qidCol, qvecCol, ...)
    k: Int,
    metricName: String,
    idCol: String, vecCol: String,
    qidCol: String, qvecCol: String,
    // output lives in the constructor so `copy()` during optimizer
    // transforms PRESERVES the exprIds parents already reference —
    // a fresh-`val` output would mint new ids on every tree rewrite
    output: Seq[Attribute] = KnnJoinPlan.freshOutput()) extends BinaryNode {

  /** The node consumes exactly (idCol, vecCol) / (qidCol, qvecCol) — this
    * is what lets ColumnPruning drop every other child column THROUGH the
    * node instead of pruning the children to nothing (the node carries no
    * expressions, so the default references would be empty). */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => a.name == idCol || a.name == vecCol) ++
      right.output.filter(a => a.name == qidCol || a.name == qvecCol))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): KnnJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner-visible index registry: map a dataset's file location to a
  * saved IVF layout the optimizer may route kNN joins through — the Spark
  * analog of "an index exists on this table". Registering an index with
  * partial probes is an explicit opt-in to approximate results (the
  * reference's n_probes contract).
  *
  * CONTRACT: the saved layout must match the relation's CURRENT contents
  * — after ANY change under the registered path (append, delete, rewrite)
  * re-register with a rebuilt index. The exact-distance routes answer
  * from the index alone (the reference's own serving semantics: a stale
  * index serves stale rows until rebuilt), and the planner's memoized
  * statistics are only dropped by register/unregister. */
object GraftIndexCatalog {
  case class Entry(indexPath: String, nProbes: Int, kCoarse: Int)
  private val byPath = scala.collection.concurrent.TrieMap.empty[String, Vector[Entry]]
  /** nProbes = 0 opts into cost-based probe selection: the planner derives
    * the probe count from the index statistics at rewrite time.
    *
    * MULTIPLE layouts may be registered over one relation (call register
    * once per layout): the resolver then routes each kNN join through the
    * CHEAPEST routable one by expected bytes read — the layout-level
    * analog of the reference's per-query plan factory
    * (search_plan.cuh:113-133; composite neighbors/composite/index.hpp:20).
    * Re-registering the SAME indexPath replaces that layout's entry (and
    * drops the statistics memos — the rebuild-after-append contract);
    * `unregister(dataPath)` removes every layout on the relation. */
  def register(dataPath: String, indexPath: String, nProbes: Int = 0, kCoarse: Int = 0): Unit = {
    val e = Entry(indexPath, nProbes, kCoarse)
    byPath.updateWith(normalize(dataPath)) {
      case Some(v) =>
        Some(v.filterNot(x => normalize(x.indexPath) == normalize(indexPath)) :+ e)
      case None => Some(Vector(e))
    }
    clearProbeCache()
  }
  def unregister(dataPath: String): Unit = {
    byPath.remove(normalize(dataPath))
    clearProbeCache()
  }
  def lookup(paths: Seq[String]): Option[Entry] = lookupAll(paths).headOption
  /** Every layout registered on any of `paths`, registration order. */
  def lookupAll(paths: Seq[String]): Seq[Entry] =
    paths.flatMap(p => byPath.get(normalize(p))).flatten.distinct
  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  /** Memoized outcomes of the bounded row-count probe, keyed by
    * (scan paths, threshold). A registered path's population is stable for
    * the life of the registration (new data means a stale index anyway),
    * so the probe job runs once per path — not on every re-optimization
    * of every query over it. Cleared when any registration changes.
    *
    * CONTRACT: appending files under an already-registered path without
    * re-registering keeps the memoized small/large verdict (and, worse, a
    * stale index) — call `register` again after appending; it drops both.
    * The memo is bounded: past `probeCacheCap` distinct (paths, threshold)
    * keys the whole map resets (it is a pure perf memo, so a reset only
    * costs one re-probe per live key). */
  private val probeOutcomes =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Boolean]
  private val probeCacheCap = 1024
  private[plans] def cachedProbe(paths: Seq[String], threshold: Long)(
      probe: => Boolean): Boolean = {
    if (probeOutcomes.size >= probeCacheCap) probeOutcomes.clear()
    probeOutcomes.getOrElseUpdate((paths.map(normalize).sorted.mkString(","), threshold), probe)
  }

  /** Memoized FULL row counts (same stability contract and registration-
    * clear discipline as the bounded probe above) — the auto-probe and
    * filtered-route rate math need the registered relation's population,
    * and a registered path implies an index build already scanned it, so
    * one metadata-weight count per registration is the honest price. */
  private val countOutcomes = scala.collection.concurrent.TrieMap.empty[String, Long]
  private[plans] def cachedCount(paths: Seq[String])(count: => Long): Long = {
    if (countOutcomes.size >= probeCacheCap) countOutcomes.clear()
    countOutcomes.getOrElseUpdate(paths.map(normalize).sorted.mkString(","), count)
  }

  /** Memoized layout-sidecar reads, keyed by index path — the population
    * (`meta`) and measured recall curve (`recall_curve`) each cost one
    * tiny parquet read per registration, not one per re-optimization.
    * Same clear-on-register discipline as the statistics memos. */
  private val sidecarRowsMemo =
    scala.collection.concurrent.TrieMap.empty[String, Option[Long]]
  private[plans] def cachedSidecarRows(indexPath: String)(
      read: => Option[Long]): Option[Long] = {
    if (sidecarRowsMemo.size >= probeCacheCap) sidecarRowsMemo.clear()
    sidecarRowsMemo.getOrElseUpdate(normalize(indexPath), read)
  }
  private val sidecarCurveMemo = scala.collection.concurrent.TrieMap
    .empty[String, Option[(Seq[(Int, Double)], Option[Long])]]
  private[plans] def cachedSidecarCurve(indexPath: String)(
      read: => Option[(Seq[(Int, Double)], Option[Long])])
      : Option[(Seq[(Int, Double)], Option[Long])] = {
    if (sidecarCurveMemo.size >= probeCacheCap) sidecarCurveMemo.clear()
    sidecarCurveMemo.getOrElseUpdate(normalize(indexPath), read)
  }
  private val sidecarDepthMemo =
    scala.collection.concurrent.TrieMap.empty[String, Option[(Int, Int)]]
  private[plans] def cachedSidecarDepth(indexPath: String)(
      read: => Option[(Int, Int)]): Option[(Int, Int)] = {
    if (sidecarDepthMemo.size >= probeCacheCap) sidecarDepthMemo.clear()
    sidecarDepthMemo.getOrElseUpdate(normalize(indexPath), read)
  }

  // test hooks: pin that the sidecar path leaves the count memo untouched
  // and that filter-count memo keys carry content identity
  private[graft] def countMemoSize: Int = countOutcomes.size
  private[graft] def statKeySnapshot: Set[String] = statOutcomes.keySet.toSet

  private[plans] def clearProbeCache(): Unit = {
    probeOutcomes.clear()
    countOutcomes.clear()
    statOutcomes.clear()
    sidecarRowsMemo.clear()
    sidecarCurveMemo.clear()
    sidecarDepthMemo.clear()
    layoutMemo.clear()
    resolvedMemo.clear()
  }

  /** Memoized live-version resolution of a registered layout root
    * (TieredIndex's version-directory scheme: an in-place-compacted
    * tiered layout's current content lives in the highest committed
    * `v_NNNNNN` subdirectory; everything else resolves to itself) — one
    * filesystem listing per registration, not one per re-optimization.
    * Same clear-on-register discipline as the other memos, and
    * `invalidateStats()` (called by the in-process auto-compaction)
    * drops it so the next rewrite plans on the new version. */
  private val resolvedMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private[plans] def cachedResolved(indexPath: String)(
      resolve: => String): String = {
    if (resolvedMemo.size >= probeCacheCap) resolvedMemo.clear()
    resolvedMemo.getOrElseUpdate(normalize(indexPath), resolve)
  }
  /** Drop one root's memoized resolution — the resolver's self-check path
    * when the memoized version directory no longer exists on disk. */
  private[plans] def invalidateResolved(indexPath: String): Unit =
    resolvedMemo.remove(normalize(indexPath))

  /** Route taken by each KnnJoinPlan rewrite, keyed by the NODE's output
    * exprIds — `(layout, indexPath)` when an index route produced the
    * plan; a brute lowering REMOVES the node's entry. The routes that
    * materialize the index at REWRITE time (the HNSW local-kernel beam
    * collects the hierarchy while planning) leave no index file scan in
    * the executed plan, so the structural detector alone can't see them;
    * this marker records the decision at the moment the non-brute branch
    * actually built the plan (the `Hnsw.lastSearchRoute` diagnostic
    * pattern). Per-node (not a thread-global last-write) so a frame with
    * TWO kNN nodes never earns the bit from the other node's route, and a
    * frame planned on a different thread than the reader keeps its
    * marker. The exprIds BIND each marker to one node instance —
    * a consumer matches them against its own frame's analyzed plan, so a
    * marker from some other query can never be claimed falsely. Bounded:
    * a pure diagnostic memo, reset wholesale past the cap. */
  def routeMarkerFor(ids: Seq[Long]): Option[(String, String)] =
    routeMarkers.get(ids.sorted.mkString(","))
  private val routeMarkers =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private val markerCap = 4096
  private[plans] def recordRoute(ids: Seq[Long],
      route: Option[(String, String)]): Unit = {
    val key = ids.sorted.mkString(",")
    route match {
      case Some(r) =>
        // evict HALF, not everything: a cleared marker cannot be
        // recomputed on read (unlike the statistic memos), so a wholesale
        // wipe would flip earned route bits of still-live frames to
        // false negatives; halving bounds the blast radius
        if (routeMarkers.size >= markerCap)
          routeMarkers.keys.take(markerCap / 2).foreach(routeMarkers.remove)
        routeMarkers.put(key, r)
      case None => routeMarkers.remove(key)
    }
  }

  /** Memoized scalar measurements of the filtered-route rate probes,
    * keyed by (scan paths, shape fingerprint) — same clear-on-register
    * discipline as the row probes: without it every re-optimization of a
    * filtered query re-pays a plan-time scan job. */
  private val statOutcomes = scala.collection.concurrent.TrieMap.empty[String, Double]
  private[plans] def cachedStat(key: String)(stat: => Double): Double = {
    if (statOutcomes.size >= probeCacheCap) statOutcomes.clear()
    statOutcomes.getOrElseUpdate(key, stat)
  }

  /** Memoized layout classification (the list-table existence probes) —
    * with multi-layout registrations the resolver classifies EVERY
    * registered entry per rewrite, so the filesystem exists() chain runs
    * once per registration, not once per re-optimization. */
  private val layoutMemo = scala.collection.concurrent.TrieMap.empty[String, Option[String]]
  private[plans] def cachedLayout(indexPath: String)(
      classify: => Option[String]): Option[String] = {
    if (layoutMemo.size >= probeCacheCap) layoutMemo.clear()
    layoutMemo.get(normalize(indexPath)).getOrElse {
      val r = classify
      // a None (unknown/unreadable layout) is NOT memoized: a save racing
      // the first query, or a filesystem hiccup, must not pin the
      // registration to brute until the next register call — re-probe
      if (r.isDefined) layoutMemo.put(normalize(indexPath), r)
      r
    }
  }

  /** Drop every memoized statistic/sidecar/layout read — for callers
    * that changed a layout's on-disk contents UNDER a live registration
    * (TieredIngest's in-place auto-compaction): without this, a
    * still-registered path would keep serving the pre-compaction
    * population, curve, and delta statistics until the next register
    * call. The route markers (pure diagnostics bound to executed
    * frames) are deliberately kept. */
  private[graft] def invalidateStats(): Unit = clearProbeCache()
}

/** Lowers KnnJoinPlan into a physical route chosen by the planner:
  * a registered IVF layout on the data relation -> probe-pruned index
  * search + exact refine; otherwise the brute-force partial-top-k
  * pipeline. */
object ResolveKnnJoin {
  /** Install the lowering rule on a live session if absent — the runtime
    * analog of GraftExtensions' injectOptimizerRule, shared by every
    * entry point that plans a KnnJoinPlan outside an extensions-configured
    * session (a planned-but-never-lowered node dies with Spark's opaque
    * "No plan for" assertion at execution). A GraftExtensions-configured
    * session already runs the rule via the optimizer's extended rules —
    * detected so register()/query paths don't stack a second full-tree
    * pass onto every query for the session's lifetime. */
  def ensureInstalled(spark: SparkSession): Unit = {
    // narrow catch: only the expected "not a classic optimizer" failures
    // (cast/linkage on a connect/foreign session) mean "can't introspect";
    // anything else should surface, not silently duplicate the rule
    val injected =
      try org.apache.spark.sql.graft.bridge.optimizer(spark)
        .extendedOperatorOptimizationRules.exists(_.isInstanceOf[ResolveKnnJoin])
      catch {
        case _: ClassCastException | _: LinkageError | _: UnsupportedOperationException =>
          false
      }
    // check-and-append must be atomic: two threads registering on one
    // session used to stack duplicate rule instances (benign output, but
    // a redundant full-tree optimizer pass per query, forever)
    if (!injected) spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[ResolveKnnJoin]))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ ResolveKnnJoin(spark)
    }
  }

  /** Layouts already warned about a missing `recall_curve` sidecar —
    * bound the log to one line per registration, not one per
    * re-optimization. (The committed FIXTURE curve that used to back
    * legacy layouts is retired: every save since r13 measures its own
    * curve, and inverting one corpus's geometry on another silently
    * missed recall floors — a legacy layout now probes every list until
    * re-saved, docs/MIGRATION.md.) */
  private[plans] val noCurveWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One-sided Wilson lower confidence bound on a measured proportion —
    * the statistical floor under the curve sidecars' recall points.
    * z = 1.645 (95% one-sided): over n = n_queries·k held-out (query,
    * true neighbor) pairs, the true recall exceeds this bound with 95%
    * confidence, so inverting the bound instead of the point estimate
    * turns "measured 0.95 once" into "statistically at least 0.95". */
  def wilsonLower(p: Double, n: Long, z: Double = 1.645): Double = {
    if (n <= 0) p
    else {
      val z2 = z * z
      val center = p + z2 / (2.0 * n)
      val margin = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
      math.max(0.0, (center - margin) / (1.0 + z2 / n))
    }
  }

  /** Probe count for a recall target — the reference's `min_recall ≈
    * f(n_probes/n_lists)` discipline (ann_ivf_flat.cuh:102) made usable by
    * inverting THIS index's own measured probe/recall curve, taken at
    * save time on a held-out sample against its own exact top-k
    * (IvfFlatIndex.saveMeasuredCurve) — a 0.95 target means 0.95 on this
    * geometry, not on some other corpus's. The inversion is CONSERVATIVE:
    * the smallest MEASURED probe point whose recall meets the target —
    * the sample points are the only trusted observations, and
    * interpolating a 0.95 between two noisy measurements undershoots the
    * claimed floor about half the time. When the sidecar recorded its
    * sample size (`nSamples` = n_queries·k pairs), each point is first
    * replaced by its one-sided Wilson lower bound: a point ESTIMATE of
    * 0.95 over 320 pairs is ±0.02-grade noise at exactly the default
    * decision threshold, so the inversion trusts only what the sample can
    * statistically back — a 0.95 point that can't clear the bound picks
    * the next deeper probe point (or every list) instead of claiming the
    * floor. A single-point curve is legitimate (the save sweep early-stops
    * at saturation, so an easy layout can measure 1.0 at probes = 1) and
    * inverts like any other.
    *
    * An EMPTY curve (a pre-r13 layout whose save never measured one)
    * probes every list: exactness is the only honest answer without a
    * measurement — the committed fixture curve that used to stand in is
    * retired (it was one dataset's geometry; inverting it on a harder
    * corpus silently missed the floor). Re-save the index to restore
    * calibrated selection (docs/MIGRATION.md). `targetRecall ≥ 1` and a
    * target above the curve's best measured recall also probe every list.
    * The kCoarse-coverage floor (expected scanned rows ≥ 3·kCoarse) and
    * the [1, nLists] clamp are kept. */
  def autoProbes(targetRecall: Double, nLists: Int, nRows: Long, kCoarse: Int,
      curve: Seq[(Int, Double)] = Seq.empty,
      nSamples: Option[Long] = None): Int = {
    val cv = nSamples.filter(_ > 0)
      .map(n => curve.map { case (p, r) => (p, wilsonLower(r, n)) })
      .getOrElse(curve)
    val fromCurve =
      if (cv.isEmpty || targetRecall >= 1.0 || targetRecall > cv.last._2) nLists
      else cv.find(_._2 >= targetRecall).map(_._1).getOrElse(nLists)
    val coverK = math.ceil(3.0 * kCoarse * nLists / math.max(nRows, 1L).toDouble).toInt
    math.min(nLists, math.max(1, math.max(fromCurve, coverK)))
  }

  /** Default reorder depth for a code-compressed route: the layout's
    * MEASURED worst ADC displacement (DepthHint sidecar, written at build
    * time: the deepest rank at which a true top-k neighbor appeared in
    * the full-probe code ranking of a held-out sample) plus a k margin,
    * with the legacy 4k/k+30 heuristic as the floor. A requested k AT OR
    * BELOW the measured one keeps the FULL displacement — a true top-k
    * neighbor is also a true top-measuredK neighbor, so the single
    * most-displaced neighbor the measurement saw can sit inside the
    * smaller top-k and down-scaling would silently drop it; only k above
    * the measured range extrapolates (linearly — past the measured range
    * everything is a heuristic anyway). No sidecar (legacy layout, or
    * measurement disabled at build) → the heuristic alone. */
  def compressedDepth(k: Int, hint: Option[(Int, Int)]): Int = {
    val heuristic = math.max(4 * k, k + 30)
    hint match {
      case Some((mk, disp)) if mk > 0 && disp > 0 =>
        val measured =
          if (k <= mk) disp
          else math.ceil(disp.toDouble * k / mk).toInt
        math.max(heuristic, measured + k)
      case _ => heuristic
    }
  }
}

case class ResolveKnnJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Same candidate ranking under both metrics (monotone transforms). */
  private def rankCompatible(a: Metric, b: Metric): Boolean =
    a == b || Set(a, b).subsetOf(Set[Metric](Metric.L2, Metric.L2Sqrt))

  /** Index routes are sound only when the node's data child IS the
    * registered relation — its full row population, not a subset. The
    * index routes search the CHILD frame: candidates generated from the
    * (full-population) saved index are inner-joined back to it, so any
    * row-reducing operator above the scan (a Filter, the filtered TVF's
    * semi/anti join, a Limit/Sample) silently drops candidates BEFORE
    * refine and the join under-returns k with no error — the exact
    * failure GraphSearch.searchFiltered's rate-widening exists to
    * prevent on the operator it serves. Only population-preserving
    * wrappers (projections, aliases — including the Project that
    * ColumnPruning inserts in the same optimizer batch) are admitted;
    * anything else falls back to the brute route, which is EXACT over
    * the filtered relation. This also closes the filter-table hijack:
    * a non-preserving left never consults the catalog, so an index
    * registered on the filter relation can't route the join. */
  private def indexEligible(plan: LogicalPlan): Boolean = plan match {
    case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
    case p: Project => indexEligible(p.child)
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      indexEligible(s.child)
    case _ => false
  }

  /** The SCAN-level attribute that `plan`'s output column `name` denotes,
    * following PURE renames only (an Alias of a bare AttributeReference).
    * None when the column is computed anywhere on the way down — an index
    * route would then join the index's real scan ids/vectors against
    * remapped values and return garbage, so callers must refuse the
    * route. Population-preserving (indexEligible) is about ROW COUNT;
    * this is the complementary VALUE-IDENTITY check for the two columns
    * the routes join on. */
  private def scanAttrOf(plan: LogicalPlan, a: Attribute): Option[Attribute] = plan match {
    case _: org.apache.spark.sql.execution.datasources.LogicalRelation => Some(a)
    case pr: Project => pr.projectList.find(_.exprId == a.exprId).flatMap {
      case ar: AttributeReference => scanAttrOf(pr.child, ar)
      case al: Alias => al.child match {
        case ar: AttributeReference => scanAttrOf(pr.child, ar)
        case _ => None
      }
      case _ => None
    }
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      scanAttrOf(s.child, a)
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter => scanAttrOf(f.child, a)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.left.outputSet.contains(a) => scanAttrOf(j.left, a)
    case _ => None
  }

  private def scanAttr(plan: LogicalPlan, name: String): Option[Attribute] =
    plan.output.find(_.name == name).flatMap(a => scanAttrOf(plan, a))

  private def scanPaths(plan: LogicalPlan): Seq[String] = plan.collect {
    case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      l.relation match {
        case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          h.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
  }.flatten

  /** Classify a registered layout by the list table it wrote: `hnsw_meta`
    * = HNSW hierarchy, `lists` = IVF-Flat, `pq_lists`/`pqcl_lists` =
    * IVF-PQ (per-subspace / per-cluster codebooks), `sq_lists` = IVF-SQ,
    * `scann_lists` = ScaNN, `rabitq_lists` = IVF-RaBitQ. An unknown
    * layout returns None, so the join falls back to brute force instead
    * of failing at plan time on a missing directory. */
  private def layoutOf(path: String): Option[String] =
    GraftIndexCatalog.cachedLayout(path) {
      def exists(child: String): Boolean = {
        val p = new org.apache.hadoop.fs.Path(path, child)
        p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
      }
      if (exists("hnsw_meta")) Some("hnsw")
      else if (exists("tiered_meta")) Some("tiered")
      else if (exists("lists")) Some("ivf")
      else if (exists("pq_lists")) Some("ivf_pq")
      else if (exists("pqcl_lists")) Some("ivf_pqcl")
      else if (exists("sq_lists")) Some("ivf_sq")
      else if (exists("scann_lists")) Some("scann")
      else if (exists("rabitq_lists")) Some("rabitq")
      else None
    }

  /** The ADC/decoded-code layouts score candidates in (residual) L2, so
    * their routes are sound only for L2-family node metrics — except the
    * PQ-coded layouts built UNDER InnerProduct (ivf_pq.hpp:47-205: the
    * build takes the generic metric enum), whose IP-LUT estimates rank an
    * IP node natively (see compressedScoreMetric). */
  private def l2Family(m: Metric): Boolean = m == Metric.L2 || m == Metric.L2Sqrt

  /** A population-REDUCING wrapper over an eligible scan that the
    * filtered index route understands: the node's data child is the
    * filter's OUTPUT, but candidates can still be generated from the
    * index over the full population and refined against the filtered
    * frame (refine's inner join IS the post-filter). The reference's
    * analog is in-search filtering with a pre/post strategy picked from
    * `filtering_rate` (common.hpp:500-638, cagra.hpp:346-355). */
  private sealed trait FilterShape { def base: LogicalPlan }
  /** Plain `Filter(cond)` over the scan — rate estimated by a seeded
    * hash-sampled probe. */
  private case class PredShape(cond: org.apache.spark.sql.catalyst.expressions.Expression,
      base: LogicalPlan) extends FilterShape
  /** Semi/anti equi-join against a filter relation (the `knn_join_filtered`
    * TVF's shape) — rate bounded by the filter side's row count.
    * `dataKey` is the data-side join attribute: the widening math is only
    * sound when it is the node's ID column (each filter row then drops at
    * most ONE distinct candidate id; a join on any other column — e.g. a
    * category — drops unboundedly many rows per filter row, so both the
    * depth+nFilter bound and the nFilter/nBase rate would silently
    * under-cover). The caller checks dataKey against kj.idCol. */
  private case class JoinShape(filterSide: LogicalPlan, anti: Boolean,
      base: LogicalPlan, dataKey: Attribute, filterKey: Attribute) extends FilterShape

  private def filteredShape(plan: LogicalPlan): Option[FilterShape] = plan match {
    case p: Project => filteredShape(p.child)
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      filteredShape(s.child)
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if indexEligible(f.child) => Some(PredShape(f.condition, f.child))
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if (j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi ||
            j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti) &&
          indexEligible(j.left) =>
      // only a single-attribute equi-join bounds the dropped-candidate
      // count by the filter side's cardinality (the widening math)
      j.condition match {
        case Some(org.apache.spark.sql.catalyst.expressions.EqualTo(
            a: Attribute, b: Attribute)) =>
          val leftSet = j.left.outputSet
          val keys =
            if (leftSet.contains(a) && !leftSet.contains(b)) Some((a, b))
            else if (leftSet.contains(b) && !leftSet.contains(a)) Some((b, a))
            else None
          keys.map { case (dataKey, filterKey) => JoinShape(j.right,
            anti = j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti,
            j.left, dataKey, filterKey) }
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case kj: KnnJoinPlan if kj.left.resolved && kj.right.resolved =>
      // a brute lowering must CLEAR this node's route marker, or a prior
      // routed rewrite of the same node would leave a stale earned bit
      val nodeIds = kj.output.map(_.exprId.id)
      GraftIndexCatalog.recordRoute(nodeIds, None)
      val data = B.ofRows(spark, kj.left)
      val queries = B.ofRows(spark, kj.right)
        .select(col(kj.qidCol).as("qid"), col(kj.qvecCol).as("qvec"))
      // `udf:<name>` = a session-registered scalar function as the metric
      // (distance.hpp:66 CustomUDF=101, JIT'd in the reference; here the
      // registry IS the JIT). Lowered below, never index-routed: a saved
      // layout's candidate ranking has no relation to an arbitrary metric.
      val udfMetric: Option[String] =
        Option(kj.metricName).filter(_.startsWith("udf:")).map(_.stripPrefix("udf:"))
      lazy val metric = Metric.fromName(kj.metricName)
      def coarseK(e: GraftIndexCatalog.Entry, compressed: Boolean): Int =
        if (e.kCoarse > 0) e.kCoarse
        // the compressed-code estimators (ADC / decoded int8) rank with
        // quantization noise, so their default reorder depth carries more
        // margin (the reference's refine recall-recovery discipline) —
        // calibrated by the layout's measured displacement sidecar when
        // one exists (ResolveKnnJoin.compressedDepth)
        else if (compressed)
          ResolveKnnJoin.compressedDepth(kj.k,
            GraftIndexCatalog.cachedSidecarDepth(e.indexPath) {
              graft.index.DepthHint.load(spark, e.indexPath)
            })
        else math.max(2 * kj.k, kj.k + 10)

      /** Registered-population row count: the layout's `meta` sidecar by
        * preference (the build already knew n; no plan-time job at all),
        * falling back to a memoized zero-column count for legacy layouts
        * saved before the sidecar existed. */
      def baseRows(e: GraftIndexCatalog.Entry, base: LogicalPlan): Long =
        GraftIndexCatalog.cachedSidecarRows(e.indexPath) {
          graft.index.IvfFlatIndex.loadMeta(spark, e.indexPath)
        }.getOrElse(GraftIndexCatalog.cachedCount(scanPaths(base)) {
          B.ofRows(spark, base).count()
        })

      /** Probe count: explicit registration wins; `nProbes = 0` derives
        * from `spark.graft.knnJoin.targetRecall` (default 0.95) through
        * THIS layout's measured probe/recall curve (the `recall_curve`
        * sidecar written at save time; a legacy layout without one probes
        * every list — exact, and warned once — until re-saved,
        * docs/MIGRATION.md); a caller-set `autoProbeFraction` keeps the
        * legacy fraction semantics for sessions that pinned it. */
      def resolveProbes(e: GraftIndexCatalog.Entry, base: LogicalPlan,
          nLists: Int, depth: Int): Int =
        if (e.nProbes > 0) e.nProbes
        else {
          val n = math.max(baseRows(e, base), 1L)
          val coverK = math.ceil(3.0 * depth * nLists / n.toDouble).toInt
          spark.conf.getOption("spark.graft.knnJoin.autoProbeFraction") match {
            case Some(frac) =>
              val fracProbes = math.max(1, math.ceil(nLists * frac.toDouble).toInt)
              math.min(nLists, math.max(coverK, fracProbes))
            case None =>
              val target =
                spark.conf.get("spark.graft.knnJoin.targetRecall", "0.95").toDouble
              val curve = GraftIndexCatalog.cachedSidecarCurve(e.indexPath) {
                graft.index.IvfFlatIndex.loadCurveWithN(spark, e.indexPath,
                  "recall_curve")
              }
              if (curve.isEmpty && ResolveKnnJoin.noCurveWarned.add(e.indexPath))
                logWarning(s"knn_join: layout at ${e.indexPath} carries no measured " +
                  "recall_curve sidecar (pre-r13 save); auto mode probes EVERY list " +
                  "(exact but unpruned) — re-save the index to restore calibrated " +
                  "probe selection (docs/MIGRATION.md)")
              ResolveKnnJoin.autoProbes(target, nLists, n, depth,
                curve.map(_._1).getOrElse(Seq.empty),
                nSamples = curve.flatMap(_._2))
          }
        }

      // The index routes are only sound when the saved index ranks
      // candidates the way the node's declared metric would — candidates
      // are generated with the index's own metric, and refine re-ranks
      // only within them. L2 and L2Sqrt are rank-equivalent (sqrt is
      // monotone); any other mismatch (e.g. a Cosine knn_join over an
      // L2-built index) falls back to the exact brute-force route
      // instead of silently degrading results. The code-compressed
      // layouts additionally require an L2-family node metric (their
      // candidate estimators score in residual L2).

      /** A code-compressed route can miss a recall floor EVEN at full
        * probes — the reorder depth caps the candidates and the ADC
        * estimate orders them, so "probe everything" is not the exactness
        * fallback it is on raw-vector layouts. In auto mode (nProbes = 0,
        * no pinned fraction) the layout's own measured refine-composed
        * curve is the floor evidence: if its BEST Wilson-bounded point
        * cannot reach the session target, the route refuses and the exact
        * brute pipeline serves the query. Measured on a 2M uniform-random
        * 256-dim corpus (the adversarial geometry): displacement capped
        * at 4096, curve saturated at recall 0.16, and the capped-depth
        * route cost 2.6× the brute scan — refusing is both honest and
        * faster there. Explicit registrations (nProbes > 0, kCoarse > 0 —
        * a pinned depth changes the recall the measured-at-calibrated-depth
        * curve speaks for, e.g. kCoarse = n is near-exact regardless — or a
        * pinned autoProbeFraction) keep the user's call; a legacy layout without
        * a curve keeps the documented pre-r15 behavior (no evidence
        * either way). */
      def compressedFloorReachable(e: GraftIndexCatalog.Entry): Boolean =
        e.nProbes > 0 || e.kCoarse > 0 ||
          spark.conf.getOption("spark.graft.knnJoin.autoProbeFraction").isDefined || {
            val target =
              spark.conf.get("spark.graft.knnJoin.targetRecall", "0.95").toDouble
            GraftIndexCatalog.cachedSidecarCurve(e.indexPath) {
              graft.index.IvfFlatIndex.loadCurveWithN(spark, e.indexPath,
                "recall_curve")
            } match {
              case Some((cv, nSamples)) if cv.nonEmpty =>
                val best = cv.map(_._2).max
                nSamples.filter(_ > 0)
                  .map(nn => ResolveKnnJoin.wilsonLower(best, nn))
                  .getOrElse(best) >= target
              case _ => true
            }
          }

      /** The ef an HNSW route will ACTUALLY search with: default-depth
        * registrations (kCoarse = 0) invert THIS layout's measured
        * ef/recall sidecar at the session's recall target — the hierarchy
        * twin of the IVF auto-probe mode; an explicit kCoarse keeps
        * pinning ef via depth, and legacy layouts without a curve keep
        * the ef0 floor. Shared by candidate generation AND the layout
        * cost model, so an hnsw layout can never outbid a rival on a
        * smaller ef than the one its route would then search with. */
      def hnswEf(e: GraftIndexCatalog.Entry, ef0: Int): Int =
        if (e.kCoarse > 0) ef0
        else {
          val target = spark.conf.get(
            "spark.graft.knnJoin.targetRecall", "0.95").toDouble
          GraftIndexCatalog.cachedSidecarCurve(e.indexPath + "#ef") {
            graft.index.IvfFlatIndex.loadCurveWithN(spark, e.indexPath,
              "ef_curve")
          } match {
            case Some((cv0, nSamples)) =>
              // same Wilson-bound discipline as the IVF probe
              // inversion: trust only what the sample can back
              val cv = nSamples.filter(_ > 0)
                .map(n => cv0.map { case (p, r) =>
                  (p, ResolveKnnJoin.wilsonLower(r, n)) })
                .getOrElse(cv0)
              math.max(ef0,
                cv.find(_._2 >= target).map(_._1).getOrElse(cv.last._1))
            case None => ef0
          }
        }

      /** PQ-coded layout routability for the node's metric: an L2-family
        * node over an L2-family build ranks by ADC residual-L2; an
        * InnerProduct node over an InnerProduct-BUILT layout ranks by the
        * IP-LUT estimated dot; a Cosine node over a Cosine-BUILT layout
        * (vectors unit-normalized at build, queries normalized at search
        * — ivf_pq.hpp:47-205's metric enum covers cosine the same way)
        * ranks by the IP-LUT dot over normalized vectors, which orders
        * identically to cosine similarity. Any other pairing (e.g. a
        * cosine node over an L2-built layout whose candidate ranking has
        * no relation to angles) refuses the route → exact brute. */
      def compressedScoreMetric(idxMetric: Metric): Option[Metric] =
        if (idxMetric == Metric.InnerProduct && metric == Metric.InnerProduct)
          Some(Metric.InnerProduct)
        else if (idxMetric == Metric.Cosine && metric == Metric.Cosine)
          Some(Metric.Cosine)
        else if (rankCompatible(idxMetric, metric) && l2Family(metric))
          Some(Metric.L2)
        else None

      /** Candidate generation per layout at reorder depth `depth`,
        * searched over the FULL registered population (`base`), or None
        * when the layout/metric pairing is unroutable. Returns the
        * candidate frame, the metric its `dist` column is computed in,
        * and whether those distances are EXACT (raw-vector layouts) or
        * code-space estimates (ADC / decoded int8). */
      def candidates(e: GraftIndexCatalog.Entry, layout: String,
          base: LogicalPlan, depth: Int): Option[(DataFrame, Metric, Boolean)] =
        layout match {
          case "hnsw" =>
            val idx = graft.index.Hnsw.load(spark, e.indexPath)
            if (!rankCompatible(idx.params.metric, metric)) None
            else {
              // pin the base-beam bound EXPLICITLY at the ef-tracking
              // value: baseIterations = 0 resolves differently per kernel
              // route (max(10, ef) local/hybrid, 10 on the distributed
              // loop), and a planner rewrite must return the same rows
              // wherever the cost model lands; the distributed loop exits
              // on an empty frontier, so the honest bound costs jobs only
              // while the beam still improves
              val ef0 = math.max(40, depth)
              val ef = hnswEf(e, ef0)
              Some((graft.index.Hnsw.search(idx, B.ofRows(spark, base), queries,
                depth, ef = ef, kj.idCol, kj.vecCol,
                baseIterations = math.max(10, ef)), idx.params.metric, true))
            }
          case "ivf" =>
            val idx = graft.index.IvfFlatIndex.load(spark, e.indexPath)
            if (!rankCompatible(idx.metric, metric)) None
            else Some((idx.search(queries, depth,
              resolveProbes(e, base, idx.centroids.k, depth)), idx.metric, true))
          case "tiered" =>
            // the streaming-ingest lifecycle layout (tiered_index.hpp:
            // 59-136): candidates = probe-pruned ANN-tier search ∪ exact
            // scan of the (small) delta tier, merged per query — both
            // tiers carry EXACT raw-vector distances, so the route
            // finishes directly like IVF-Flat. The registration contract
            // covers the pair: base + delta must equal the relation.
            val idx = graft.stream.TieredIndex.load(spark, e.indexPath)
            if (!rankCompatible(idx.metric, metric)) None
            else Some((idx.search(queries, depth,
              resolveProbes(e, base, idx.base.centroids.k, depth)), idx.metric, true))
          case "ivf_sq" =>
            // decoded int8 scored under the index's own metric —
            // quantization noise makes the dists estimates, not exact
            if (!compressedFloorReachable(e)) None
            else {
              val idx = graft.index.IvfSqIndex.load(spark, e.indexPath)
              if (!rankCompatible(idx.metric, metric)) None
              else Some((idx.search(queries, depth,
                resolveProbes(e, base, idx.centroids.k, depth)), idx.metric, false))
            }
          case "ivf_pq" =>
            if (!compressedFloorReachable(e)) None
            else {
              val idx = graft.index.IvfPqIndex.load(spark, e.indexPath)
              compressedScoreMetric(idx.metric).map(m => (idx.search(queries, depth,
                resolveProbes(e, base, idx.centroids.k, depth)), m, false))
            }
          case "ivf_pqcl" =>
            if (!compressedFloorReachable(e)) None
            else {
              val idx = graft.index.IvfPqClusterIndex.load(spark, e.indexPath)
              compressedScoreMetric(idx.metric).map(m => (idx.search(queries, depth,
                resolveProbes(e, base, idx.centroids.k, depth)), m, false))
            }
          case "scann" =>
            if (!compressedFloorReachable(e)) None
            else {
              val idx = graft.index.ScannIndex.load(spark, e.indexPath)
              compressedScoreMetric(idx.metric).map(m => (idx.search(queries, depth,
                resolveProbes(e, base, idx.centroids.k, depth)), m, false))
            }
          case "rabitq" =>
            // RaBitQ estimates are L2-only by construction
            if (!compressedFloorReachable(e) || !l2Family(metric)) None
            else {
              val idx = graft.index.IvfRabitqIndex.load(spark, e.indexPath)
              Some((idx.search(queries, depth,
                resolveProbes(e, base, idx.centroids.k, depth)), Metric.L2, false))
            }
          case _ => None
        }

      /** EXACT dist map to the node metric: identity, or sqrt of the same
        * accumulated double (bit-identical to recomputing L2Sqrt from the
        * vectors — Distance.l2sqrt IS sqrt of the l2 sum). The reverse
        * (squaring an already-rounded sqrt) is NOT exact (~1 ulp double
        * rounding), so that combination keeps the refine path; None =
        * no exact map. */
      def toNodeDist(from: Metric): Option[Column => Column] =
        if (from == metric) Some(identity)
        else if (from == Metric.L2 && metric == Metric.L2Sqrt)
          Some((c: Column) => sqrt(c))
        else None

      /** What stands between the index's candidates and the node's
        * output: nothing (full population), a small id deny/allow list
        * (post-filter the candidates directly — no second data scan), or
        * an arbitrary predicate/large filter (post-filter THROUGH the
        * node's own filtered child). */
      sealed trait Post
      case object NoFilter extends Post
      case class IdFilter(filterSide: LogicalPlan, key: Attribute,
          anti: Boolean) extends Post
      case object ViaData extends Post

      /** Index route = candidates over the full population, then the
        * cheapest sound finish:
        *  - EXACT-distance layouts (raw-vector IVF-Flat, HNSW) with no
        *    filter or a small id filter never touch the data again: the
        *    candidate dists map monotonically to the node metric and the
        *    select_k epilogue re-ranks — at 100 TB this is the difference
        *    between reading nProbes/nLists of the bytes and reading them
        *    all a second time for refine (refine.hpp exists for CODE
        *    layouts, whose estimates need exact recomputation);
        *  - code layouts, and any shape that must evaluate a predicate,
        *    refine against the node's data child — its inner join IS the
        *    post-filter, so disallowed ids can never surface.
        * `widen` turns the layout's base reorder depth into (final depth,
        * small-id-filter?) — identity for full population, the
        * filtering_rate analog for filtered shapes, None = brute. */
      def routeFor(e: GraftIndexCatalog.Entry, layout: String, base: LogicalPlan,
          widen: Int => Option[(Int, Boolean)], post: Post): Option[DataFrame] = {
          val compressed =
            layout == "ivf_pq" || layout == "ivf_pqcl" || layout == "scann" ||
              layout == "rabitq" || layout == "ivf_sq"
          widen(coarseK(e, compressed)).flatMap { case (depth, smallIdFilter) =>
            candidates(e, layout, base, depth).map { case (cand, candMetric, exact) =>
              GraftIndexCatalog.recordRoute(nodeIds, Some((layout, e.indexPath)))
              // the broadcast post-filter re-joins on ids cast to long, so
              // the id key type must make that cast lossless — a string
              // or fractional id would change the user's typed equality
              def integral(t: org.apache.spark.sql.types.DataType): Boolean = t match {
                case org.apache.spark.sql.types.LongType |
                     org.apache.spark.sql.types.IntegerType |
                     org.apache.spark.sql.types.ShortType |
                     org.apache.spark.sql.types.ByteType => true
                case _ => false
              }
              // direct finish answers from the index ALONE (no refine join
              // against the live relation), so a stale index serves
              // deleted/rewritten rows the refine inner-join used to mask.
              // The registration contract already forbids stale indexes
              // (GraftIndexCatalog doc), but existing registrations that
              // leaned on that masking can pin the old refine behavior
              // with this conf (docs/MIGRATION.md).
              val distMap =
                if (exact && spark.conf.get(
                    "spark.graft.knnJoin.directFinish.enabled", "true").toBoolean)
                  toNodeDist(candMetric)
                else None
              val directFinish = distMap.isDefined && (post match {
                case NoFilter => true
                case f: IdFilter =>
                  smallIdFilter && integral(f.key.dataType)
                case ViaData => false
              })
              if (directFinish) {
                val scored = cand.select(col("qid"),
                  col("nbr_id").cast("long").as("id"),
                  distMap.get(col("dist")).as("dist"))
                val allowed = post match {
                  case IdFilter(fs, key, anti) =>
                    val ids = B.ofRows(spark, fs)
                      .select(B.column(key).cast("long").as("id"))
                    scored.join(org.apache.spark.sql.functions.broadcast(ids),
                      Seq("id"), if (anti) "left_anti" else "left_semi")
                  case _ => scored
                }
                BruteForceKnn.knnFromDistances(allowed, kj.k,
                  minClose = Metric.isMinClose(metric))
              } else {
                // pin the refine join's build side: candidates are
                // q·depth·16 B — within the same broadcast budget class
                // as the query side every route already broadcasts when
                // the depth is moderate; past the per-query byte budget
                // (e.g. a displacement-capped depth 4096) leave the
                // strategy to Catalyst/AQE rather than risk the driver
                val bcastCand = depth.toLong * 16L <= spark.conf.get(
                  "spark.graft.refine.maxBroadcastBytesPerQuery", "8192").toLong
                graft.ops.Refine.refine(cand.select(col("qid"), col("nbr_id").as("id")),
                  data, queries, kj.k, metric, kj.idCol, kj.vecCol,
                  broadcastCandidates = bcastCand)
              }
            }
          }
        }

      // Plan-time statistics gate — the search_plan.cuh:113-133 analog:
      // the route is a cost decision on relation statistics, not just
      // index availability. Below `minIndexRows` the brute partial-top-k
      // pipeline (one scan stage) beats any index route (centroid join +
      // pruned list join + exact refine join), so a registered index is
      // bypassed. Row count comes from the logical plan's stats when the
      // catalog knows it; otherwise a bounded incremental probe that
      // stops at the threshold — never a full count of the data side.
      // minIndexRows <= 0 disables the gate (always trust registration).
      val minIndexRows =
        spark.conf.get("spark.graft.knnJoin.minIndexRows", "100000").toLong
      def bigEnoughForIndex(base: LogicalPlan): Boolean =
        minIndexRows <= 0 ||
          base.stats.rowCount.map(_ >= BigInt(minIndexRows)).getOrElse(
            GraftIndexCatalog.cachedProbe(scanPaths(base), minIndexRows) {
              !graft.graphops.LocalKernel.within(
                B.ofRows(spark, base).select(col(kj.idCol)), minIndexRows - 1)
            })

      /** Expected per-query read cost of routing through `e`, in RAW-ROW
        * units — the cost model behind multi-layout selection (the
        * reference picks its plan per query from alternatives,
        * search_plan.cuh:113-133; composite
        * neighbors/composite/index.hpp:20): probe-fraction × population,
        * scaled by the stored row's width relative to the raw vector
        * (codes are narrower), plus the exact-refine read (reorder depth
        * in raw rows) on code-compressed layouts, plus the delta tier's
        * exact scan on tiered layouts; an HNSW beam reads ~ef·m vectors.
        * Every input is a memoized one-row sidecar read (centroid
        * count/dim, codebook pq_dim, population) — never the lists; an
        * unreadable layout costs MaxValue so a broken candidate can never
        * outbid a working one. */
      def layoutCost(e: GraftIndexCatalog.Entry, layout: String,
          base: LogicalPlan, depthOverride: Option[Int] = None): Double =
        try {
          // every stat below is a DRIVER-SIDE sidecar read (r17,
          // SidecarIO): a missing path/field throws here and the catch
          // prices the layout MaxValue, exactly like the old job-based
          // head() did
          if (layout == "hnsw") {
            val m = GraftIndexCatalog.cachedStat(s"cost:m:${e.indexPath}") {
              graft.sources.SidecarIO.asDouble(graft.sources.SidecarIO
                .readHead(spark, s"${e.indexPath}/hnsw_meta").get.apply("m"))
            }
            // price the ef the route would REALLY search with (the same
            // ef_curve inversion candidate generation applies) — a stale
            // max(40, depth) here could win the bid and then read far more
            hnswEf(e, math.max(40,
              depthOverride.getOrElse(coarseK(e, compressed = false)))) * m
          } else {
            val compressed = layout == "ivf_pq" || layout == "ivf_pqcl" ||
              layout == "scann" || layout == "rabitq" || layout == "ivf_sq"
            val depth = depthOverride.getOrElse(coarseK(e, compressed))
            val statsBase =
              if (layout == "tiered") s"${e.indexPath}/tiered_base" else e.indexPath
            val nLists = GraftIndexCatalog.cachedStat(s"cost:nlists:$statsBase") {
              // footer-only record count — no data pages, no job
              graft.sources.SidecarIO.rowCount(spark, s"$statsBase/centroids")
                .get.toDouble
            }
            val dim = GraftIndexCatalog.cachedStat(s"cost:dim:$statsBase") {
              graft.sources.SidecarIO.asDouble(graft.sources.SidecarIO
                .readHead(spark, s"$statsBase/centroids").get.apply("dim"))
            }
            val n = math.max(baseRows(e, base), 1L).toDouble
            val probes = resolveProbes(e, base, math.max(1, nLists.toInt), depth)
            val pf = probes / math.max(1.0, nLists)
            val width = layout match {
              case "ivf" | "tiered" => 1.0
              case "ivf_sq" => 0.25        // int8 codes vs float32
              case "rabitq" =>             // bits_per_dim vs float32
                val bits = GraftIndexCatalog.cachedStat(s"cost:rbits:${e.indexPath}") {
                  graft.sources.SidecarIO.asDouble(graft.sources.SidecarIO
                    .readHead(spark, s"${e.indexPath}/rotation").get.apply("bits_per_dim"))
                }
                bits / 32.0
              case _ =>                    // PQ family: pq_dim ints vs dim floats
                val pqBooks =
                  if (layout == "ivf_pqcl") "cluster_codebooks" else "codebooks"
                val pqDim = GraftIndexCatalog.cachedStat(s"cost:pqdim:${e.indexPath}") {
                  graft.sources.SidecarIO.asDouble(graft.sources.SidecarIO
                    .readHead(spark, s"${e.indexPath}/$pqBooks").get.apply("pq_dim"))
                }
                pqDim / math.max(1.0, dim)
            }
            val deltaScan =
              if (layout == "tiered")
                GraftIndexCatalog.cachedStat(s"cost:delta:${e.indexPath}") {
                  val meta = graft.sources.SidecarIO
                    .readHead(spark, s"${e.indexPath}/tiered_meta").get
                  meta.get("delta_rows")
                    .map(graft.sources.SidecarIO.asDouble).getOrElse(0.0)
                }
              else 0.0
            // the tiered meta population is base + delta; only the BASE is
            // probe-pruned (the delta is always scanned exactly), so the
            // delta must not also ride the pf term
            val pop =
              if (layout == "scann") 2.0 * n // SOAR stores 2 copies
              else math.max(0.0, n - deltaScan)
            pf * pop * width + (if (compressed) depth.toDouble else 0.0) + deltaScan
          }
        } catch {
          case scala.util.control.NonFatal(_) => Double.MaxValue
        }

      /** A registration whose search parameters the USER pinned — an
        * explicit probe count, an explicit reorder depth, or a session
        * autoProbeFraction. Such registrations keep the user's call in
        * every price/floor decision (the same discipline as
        * compressedFloorReachable); only FULLY-AUTO entries submit to the
        * cost model's brute arm below. */
      def explicitRegistration(e: GraftIndexCatalog.Entry): Boolean =
        e.nProbes > 0 || e.kCoarse > 0 ||
          spark.conf.getOption("spark.graft.knnJoin.autoProbeFraction").isDefined

      /** Registered layouts on `base`, cheapest-first when there is a
        * choice, with the BRUTE ALTERNATIVE priced as a competing arm —
        * the reference's own plan factory prices its fallback path too
        * (knn_brute_force.cuh:353-501 fused-vs-tiled choice;
        * search_plan.cuh:113-133). Brute reads the full population at raw
        * row width and refines nothing, so its expected per-query read is
        * exactly `n` in layoutCost's raw-row currency; a fully-auto
        * layout whose route prices at or above that is dropped here and
        * the exact brute pipeline serves the query (e.g. a layout whose
        * measured curve demands every probe, or a compressed layout whose
        * displacement-calibrated refine depth approaches the population).
        * Explicit registrations keep the user's call, like the recall
        * floor; `spark.graft.knnJoin.bruteArm.enabled=false` restores the
        * pre-r17 index-if-routable behavior. An explicit-vs-auto mix
        * still sorts purely by cost — the arm only removes auto entries
        * that priced above brute, never reorders survivors. */
      def entriesFor(base: LogicalPlan): Seq[(GraftIndexCatalog.Entry, String)] = {
        val es0 = GraftIndexCatalog.lookupAll(scanPaths(base))
        if (es0.isEmpty || !bigEnoughForIndex(base)) Seq.empty
        else {
          // registrations name the layout ROOT; an in-place-compacted
          // tiered layout's current content lives in its highest committed
          // version directory (TieredIndex.resolveLive) — resolve ONCE
          // here, so every downstream load/sidecar/cost read (and the
          // route marker) addresses one consistent version. The memos key
          // sidecar statistics to the version directory they were read
          // from, so a compaction can never serve a new version with the
          // old version's statistics.
          val es = es0.map { e =>
            def resolve() = GraftIndexCatalog.cachedResolved(e.indexPath) {
              graft.stream.TieredIndex.resolveLive(spark, e.indexPath)
            }
            val memo = resolve()
            val live =
              if (memo == e.indexPath) memo
              else {
                // self-check the memo: a compaction OUTSIDE this JVM's
                // invalidation reach (another process, or a registration
                // outliving invalidateStats) can retire the memoized
                // version directory — one exists() per rewrite buys a
                // re-resolve instead of planning onto deleted files
                val p = new org.apache.hadoop.fs.Path(memo, "tiered_meta")
                if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
                  memo
                else {
                  GraftIndexCatalog.invalidateResolved(e.indexPath)
                  resolve()
                }
              }
            if (live == e.indexPath) e else e.copy(indexPath = live)
          }
          val typed = es.flatMap(e => layoutOf(e.indexPath).map(l => (e, l)))
          val ordered =
            if (typed.size <= 1) typed
            else typed.sortBy { case (e, l) => (layoutCost(e, l, base), e.indexPath) }
          val bruteArm = typed.exists(t => !explicitRegistration(t._1)) &&
            spark.conf.get("spark.graft.knnJoin.bruteArm.enabled", "true").toBoolean
          if (!bruteArm) ordered
          else ordered.filter { case (e, l) =>
            explicitRegistration(e) || {
              val brute = math.max(baseRows(e, base), 1L).toDouble
              layoutCost(e, l, base) < brute
            }
          }
        }
      }

      /** Widened reorder depth for a filtered shape — the planner-level
        * `filtering_rate` strategy (cagra.hpp:346-355): estimate the pass
        * rate, widen the depth so the allowed candidates still cover the
        * requested reorder, and refuse the route (→ exact brute over the
        * filtered frame) when the rate is unknown, below the floor, or
        * the widened depth would blow past the cap. Returns (widened
        * depth, small-id-filter?, estimated pass rate) — the rate feeds
        * the filtered brute arm at the call site: the brute alternative
        * for a filtered query scans only rate × population, so a
        * fully-auto route must price its WIDENED read under that, not
        * under the full scan. For a deny equi-join
        * whose list fits under the cap, `depth + nDeny` is used instead:
        * the anti join can drop at most nDeny distinct ids, so the
        * filtered result is as exact as the underlying candidate set
        * (exact at full probes) — the gate's shape. */
      def widenedDepth(shape: FilterShape, base: LogicalPlan,
          e: GraftIndexCatalog.Entry)(depth: Int): Option[(Int, Boolean, Double)] = {
        val widenCap =
          spark.conf.get("spark.graft.knnJoin.maxWidenedCoarse", "4096").toInt
        val rateFloor =
          spark.conf.get("spark.graft.knnJoin.minFilterRate", "0.05").toDouble
        val nBase = math.max(baseRows(e, base), 1L)
        // rate-branch result: the filter is NOT small enough to
        // post-filter candidates directly (refine via the data child)
        def byRate(rate: Double): Option[(Int, Boolean, Double)] =
          if (rate < rateFloor) None
          else {
            val d = math.ceil(depth / rate)
            if (d <= widenCap) Some((math.max(depth, d.toInt), false, rate))
            else None
          }
        val statKeyBase = scanPaths(base).sorted.mkString(",")
        shape match {
          case JoinShape(filterSide, anti, _, _, filterKey) =>
            // bound the plan-time count: a filter relation past the cap
            // can't take the exactness-preserving widening anyway, and
            // counting an arbitrarily large relation at plan time is not
            // a price a rewrite should pay — estimate nothing, go brute.
            // The count is DISTINCT join-key values: the widening math
            // counts droppable/allowed candidate IDS, and duplicate keys
            // in the filter relation drop no extra ids (a raw row count
            // would under-widen the allow-mode rate when keys repeat).
            // Memoized (-1 = over the cap) ONLY when every leaf of the
            // filter side is file-backed, keyed by (scan paths, key name,
            // the CANONICALIZED filter-side plan): the paths alone are
            // predicate-blind — two different deny views over the same
            // table would silently share the first view's count, and a
            // too-small memoized nDeny under-widens the claimed-exact
            // deny branch. The canonicalized fingerprint carries the
            // predicates; a LocalRelation anywhere in the tree makes the
            // fingerprint content-blind (it prints schema, not data), so
            // such shapes are counted fresh each optimization — bounded
            // by `within` and trivially cheap at broadcastable size.
            val maxProbe = math.max(widenCap.toLong,
              spark.conf.get("spark.graft.knnJoin.maxFilterProbeRows", "10000000").toLong)
            def countFilter(): Double = {
              val filterDf = B.ofRows(spark, filterSide)
              if (!graft.graphops.LocalKernel.within(filterDf, maxProbe)) -1.0
              else filterDf.select(B.column(filterKey)).distinct().count().toDouble
            }
            val fsPaths = scanPaths(filterSide)
            val fileBackedOnly = filterSide.collectLeaves().forall(
              _.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation])
            val nFilterStat =
              if (fsPaths.isEmpty || !fileBackedOnly) countFilter()
              else GraftIndexCatalog.cachedStat(
                s"filter:${fsPaths.sorted.mkString(",")}#${filterKey.name}#" +
                  s"${filterSide.semanticHash()}:" +
                  s"${filterSide.canonicalized.toString.take(512)}#$maxProbe")(countFilter())
            if (nFilterStat < 0) None
            else {
              val nFilter = nFilterStat.toLong
              if (anti) {
                // the small branch is exactness-preserving AND lets the
                // route post-filter candidates directly (broadcastable)
                if (depth.toLong + nFilter <= widenCap)
                  Some((depth + nFilter.toInt, true,
                    1.0 - nFilter.toDouble / nBase))
                else byRate(1.0 - nFilter.toDouble / nBase)
              } else
                // allow mode: a list small enough to broadcast implies a
                // pass rate below the floor on any index-worthy relation
                // (nFilter/nBase < minFilterRate whenever nBase clears
                // minIndexRows), where the brute pipeline over the tiny
                // semi-joined frame is the right plan anyway — so allow
                // lists take the rate path, never a direct post-filter
                byRate(math.min(1.0, nFilter.toDouble / nBase))
            }
          case PredShape(cond, b) =>
            // seeded hash-sampled pass-rate probe over the id column —
            // deterministic (a random sample would make the route's
            // depth, and so its approximate output, vary run to run);
            // memoized per (paths, condition): semanticHash covers the
            // FULL canonicalized tree (toString alone truncates long IN
            // lists at maxToStringFields), the string prefix
            // disambiguates casual hash collisions; the rate feeds only
            // the approximate widening depth. -1 = empty sample.
            val rate = GraftIndexCatalog.cachedStat(
              s"$statKeyBase#pred:${cond.semanticHash()}:" +
                cond.canonicalized.toString.take(512)) {
              val sampleTarget = 4096.0
              val pct = math.min(1000L, math.max(1L,
                math.round(sampleTarget / nBase * 1000)))
              val baseDf = B.ofRows(spark, b)
              val sampled = baseDf.filter(
                pmod(xxhash64(col(kj.idCol), lit(7L)), lit(1000L)) < pct)
              val agg = sampled.agg(
                count(lit(1)).as("n"),
                count(when(B.column(cond), 1)).as("passed")).head()
              val n = agg.getLong(0)
              if (n == 0) -1.0 else agg.getLong(1).toDouble / n
            }
            if (rate < 0) None else byRate(rate)
        }
      }

      val filteredRouteEnabled =
        spark.conf.get("spark.graft.knnJoin.filteredRoute.enabled", "true").toBoolean

      // Every index route requires the node's id/vec columns to be PURE
      // renames of scan columns (scanAttr): a computed column aliased to
      // either name would make the routes' id/vector joins against the
      // saved index silently wrong, so such shapes take the exact brute
      // pipeline. The routing chain is additionally fail-safe: any
      // unexpected analysis error while CONSTRUCTING a route demotes to
      // brute with a warning — a planner rewrite with an exact fallback
      // must never kill the query it is optimizing.
      def columnsTraceToScan(plan: LogicalPlan): Boolean =
        scanAttr(plan, kj.idCol).isDefined && scanAttr(plan, kj.vecCol).isDefined
      val viaIndex: Option[DataFrame] =
        try {
          if (udfMetric.isDefined) None
          else if (indexEligible(kj.left)) {
            if (!columnsTraceToScan(kj.left)) None
            // cheapest-first: the first layout that actually produces a
            // route wins (an unroutable cheaper layout — e.g. a metric
            // mismatch — falls through to the next)
            else entriesFor(kj.left).view.flatMap { case (e, layout) =>
              routeFor(e, layout, kj.left, d => Some((d, false)), NoFilter)
            }.headOption
          } else if (filteredRouteEnabled)
            filteredShape(kj.left)
              .filter { shape =>
                // the probes and candidate searches address the base by
                // the node's own column names, so the base must carry
                // them (a rename between filter and node -> brute), and
                // they must be pure scan renames end to end
                val names = shape.base.output.map(_.name).toSet
                names.contains(kj.idCol) && names.contains(kj.vecCol) &&
                columnsTraceToScan(kj.left) &&
                (shape match {
                  // the widening math counts DROPPED CANDIDATE IDS, so
                  // the join key must BE the node's id column — compared
                  // at SCAN level through pure renames (a derived column
                  // merely NAMED like the id drops unboundedly many rows
                  // per filter row)
                  case js: JoinShape =>
                    (for {
                      nodeId <- scanAttr(kj.left, kj.idCol)
                      keyScan <- scanAttrOf(shape.base, js.dataKey)
                    } yield nodeId.exprId == keyScan.exprId).getOrElse(false)
                  case _ => true
                })
              }
              .flatMap { shape =>
                val post = shape match {
                  case js: JoinShape => IdFilter(js.filterSide, js.filterKey, js.anti)
                  case _ => ViaData
                }
                entriesFor(shape.base).view.flatMap { case (e, layout) =>
                  // the FILTERED brute alternative reads only the filter's
                  // pass-rate fraction of the population, and the route
                  // pays its WIDENED depth — so the brute arm re-prices
                  // both sides here before candidates are generated; the
                  // same explicit-registration and conf exemptions apply.
                  // entriesFor's full-population arm stays a sound
                  // pre-filter: cost(base depth) >= n implies
                  // cost(widened) >= n >= rate * n.
                  val widen: Int => Option[(Int, Boolean)] = d0 =>
                    widenedDepth(shape, shape.base, e)(d0).flatMap {
                      case (d, small, rate) =>
                        val keep = explicitRegistration(e) ||
                          !spark.conf.get(
                            "spark.graft.knnJoin.bruteArm.enabled", "true").toBoolean ||
                          layoutCost(e, layout, shape.base, Some(d)) <
                            rate * math.max(baseRows(e, shape.base), 1L)
                        if (keep) Some((d, small)) else None
                    }
                  routeFor(e, layout, shape.base, widen, post)
                }.headOption
              }
          else None
        } catch {
          case scala.util.control.NonFatal(e) =>
            logWarning(s"knn_join: index-route construction failed " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}); " +
              "using the exact brute route")
            GraftIndexCatalog.recordRoute(nodeIds, None)
            None
        }

      /** CustomUDF lowering: distances from the registered function over
        * the broadcast query side, then the shared select_k epilogue
        * (knnFromDistances, the Precomputed pipeline). min-close by the
        * reference's own ordering contract (is_min_close is true for
        * every metric but InnerProduct, distance.hpp:72-85). */
      def udfPipeline(fname: String): DataFrame = {
        if (!B.functionRegistry(spark)
            .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(fname)))
          throw new IllegalArgumentException(
            s"knn_join: metric '$fname' is neither a known metric name nor a " +
              "registered session function")
        val pairs = data
          .select(col(kj.idCol).cast("long").as("_nid"), col(kj.vecCol).as("_nvec"))
          .crossJoin(org.apache.spark.sql.functions.broadcast(queries))
          .select(col("qid"), col("_nid"),
            org.apache.spark.sql.functions.call_udf(fname, col("qvec"), col("_nvec"))
              .cast("double").as("dist"))
        BruteForceKnn.knnFromDistances(pairs, kj.k, minClose = true, idCol = "_nid")
      }

      def brute(): DataFrame =
        BruteForceKnn.knnJoin(data, queries, kj.k, metric, kj.idCol, kj.vecCol)
      def shape(df: DataFrame): LogicalPlan =
        B.optimizedPlanOf(df.select(col("qid").cast("long"), col("nbr_id").cast("long"),
          col("rank"), col("dist")))
      val rewritten = udfMetric.map(udfPipeline).orElse(viaIndex)
      val newPlan =
        try shape(rewritten.getOrElse(brute()))
        catch {
          // Spark's InMemoryRelation canonicalization crashes when a
          // CACHED child with physical ordering/partitioning metadata
          // (range/sorted sources) is duplicated by the analyzer's
          // DeduplicateRelations — newInstance re-ids the output but not
          // the stale metadata, and the index routes' refine join is
          // exactly such a duplication. The brute pipeline uses each
          // child once (no re-instancing), so it lowers cleanly — fall
          // back to it (exact rows) instead of surfacing an opaque
          // "key not found: id#N" at the caller. A UDF metric is
          // excluded: the enum-metric brute pipeline would silently
          // compute a DIFFERENT metric than the one requested (and its
          // own single-use-per-child pipeline doesn't hit the bug).
          case e: NoSuchElementException if rewritten.isDefined && udfMetric.isEmpty =>
            logWarning("knn_join: index route hit Spark's cached-relation " +
              "canonicalization limitation (stale partitioning metadata on a " +
              "cached ordered-source frame); using the exact brute route. " +
              s"Uncache or re-materialize the input to restore the route. ($e)")
            GraftIndexCatalog.recordRoute(nodeIds, None)
            shape(brute())
        }
      // graft the rewrite under the node's declared exprIds
      val aliased: Seq[NamedExpression] = newPlan.output.zip(kj.output).map {
        case (produced, declared) =>
          Alias(produced, declared.name)(exprId = declared.exprId)
      }
      Project(aliased, newPlan)
  }
}

/** `SparkSessionExtensions` installer:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` —
  * installs the kNN-join lowering rule, the SQL distance functions
  * (`vector_distance` + fixed-metric shorthands, native expressions), and
  * the `knn_join` table-valued function (plans this file's logical node
  * from pure SQL). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => ResolveKnnJoin(session))
    graft.functions.SqlFunctions.descriptions.foreach(ext.injectFunction)
    ext.injectTableFunction(graft.functions.SqlFunctions.knnJoinTable)
    ext.injectTableFunction(graft.functions.SqlFunctions.knnJoinFilteredTable)
  }
}

/** Dataset-side entry: a DataFrame whose plan is the declarative node. */
object KnnJoinPlan {
  private[plans] def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("qid", LongType, nullable = false)(),
    AttributeReference("nbr_id", LongType, nullable = false)(),
    AttributeReference("rank", IntegerType, nullable = false)(),
    AttributeReference("dist", DoubleType, nullable = false)())

  def knnJoin(data: DataFrame, queries: DataFrame, k: Int, metric: Metric,
      idCol: String = "id", vecCol: String = "vec",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val spark = data.sparkSession
    B.ofRows(spark, KnnJoinPlan(B.planOf(data), B.planOf(queries), k, metric.name,
      idCol, vecCol, qidCol, qvecCol))
  }
}
