package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
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
  * reference's n_probes contract); refine against the raw relation keeps
  * the output metric/rank contract exact over the probed candidates. */
object GraftIndexCatalog {
  case class Entry(indexPath: String, nProbes: Int, kCoarse: Int)
  private val byPath = scala.collection.concurrent.TrieMap.empty[String, Entry]
  /** nProbes = 0 opts into cost-based probe selection: the planner derives
    * the probe count from the index statistics at rewrite time. */
  def register(dataPath: String, indexPath: String, nProbes: Int = 0, kCoarse: Int = 0): Unit = {
    byPath.put(normalize(dataPath), Entry(indexPath, nProbes, kCoarse))
    clearProbeCache()
  }
  def unregister(dataPath: String): Unit = {
    byPath.remove(normalize(dataPath))
    clearProbeCache()
  }
  def lookup(paths: Seq[String]): Option[Entry] =
    paths.flatMap(p => byPath.get(normalize(p))).headOption
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
  private[plans] def clearProbeCache(): Unit = probeOutcomes.clear()
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

  private def scanPaths(plan: LogicalPlan): Seq[String] = plan.collect {
    case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      l.relation match {
        case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          h.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
  }.flatten

  /** Classify a registered layout by the sidecar it wrote: `hnsw_meta` =
    * HNSW hierarchy, `lists` = IVF-Flat. Anything else (e.g. an IVF-SQ,
    * ScaNN, or PQ layout the resolver has no route for yet) returns None,
    * so the join falls back to brute force instead of failing at plan
    * time on a missing `lists` directory. */
  private def layoutOf(path: String): Option[String] = {
    def exists(child: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(path, child)
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    if (exists("hnsw_meta")) Some("hnsw")
    else if (exists("lists")) Some("ivf")
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case kj: KnnJoinPlan if kj.left.resolved && kj.right.resolved =>
      val data = B.ofRows(spark, kj.left)
      val queries = B.ofRows(spark, kj.right)
        .select(col(kj.qidCol).as("qid"), col(kj.qvecCol).as("qvec"))
      val metric = Metric.fromName(kj.metricName)
      def coarseK(e: GraftIndexCatalog.Entry): Int =
        if (e.kCoarse > 0) e.kCoarse else math.max(2 * kj.k, kj.k + 10)

      // The index routes are only sound when the saved index ranks
      // candidates the way the node's declared metric would — candidates
      // are generated with the index's own metric, and refine re-ranks
      // only within them. L2 and L2Sqrt are rank-equivalent (sqrt is
      // monotone); any other mismatch (e.g. a Cosine knn_join over an
      // L2-built index) falls back to the exact brute-force route
      // instead of silently degrading results.

      // Graph route: a registered HNSW layout generates candidates by
      // hierarchy beam search (ef = kCoarse), then exact refine.
      def hnswRoute(e: GraftIndexCatalog.Entry): Option[DataFrame] = {
        val idx = graft.index.Hnsw.load(spark, e.indexPath)
        if (!rankCompatible(idx.params.metric, metric)) None
        else Some {
          val kCoarse = coarseK(e)
          val cand = graft.index.Hnsw.search(idx, data, queries, kCoarse,
              ef = math.max(40, kCoarse), kj.idCol, kj.vecCol)
            .select(col("qid"), col("nbr_id").as("id"))
          graft.ops.Refine.refine(cand, data, queries, kj.k, metric,
            kj.idCol, kj.vecCol)
        }
      }

      // IVF route: probe-pruned candidate search + exact refine.
      def ivfRoute(e: GraftIndexCatalog.Entry): Option[DataFrame] = {
        val idx = graft.index.IvfFlatIndex.load(spark, e.indexPath)
        if (!rankCompatible(idx.metric, metric)) None
        else Some {
          val kCoarse = coarseK(e)
          // Cost-based probe selection (nProbes = 0 = auto). The recall
          // floor tracks the probe fraction (the reference's min_recall ~
          // f(n_probes/n_lists) discipline, ann_ivf_flat.cuh:102), so auto
          // mode is recall-first: probe `autoProbeFraction` of the lists
          // (default half — still 2x cheaper than brute force, safe without
          // a stated recall contract; an explicit nProbes is the perf
          // opt-in), raised if needed so the expected scanned rows cover
          // kCoarse three times over (E[rows/list] = n/nLists), capped at
          // a full scan.
          val nLists = idx.centroids.k
          val nProbes =
            if (e.nProbes > 0) e.nProbes
            else {
              val frac = spark.conf.get("spark.graft.knnJoin.autoProbeFraction", "0.5").toDouble
              val n = math.max(idx.lists.count(), 1L)
              val coverK = math.ceil(3.0 * kCoarse * nLists / n.toDouble).toInt
              val fracProbes = math.max(1, math.ceil(nLists * frac).toInt)
              math.min(nLists, math.max(coverK, fracProbes))
            }
          val cand = idx.search(queries, kCoarse, nProbes)
            .select(col("qid"), col("nbr_id").as("id"))
          graft.ops.Refine.refine(cand, data, queries, kj.k, metric,
            kj.idCol, kj.vecCol)
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
      def bigEnoughForIndex: Boolean =
        minIndexRows <= 0 ||
          kj.left.stats.rowCount.map(_ >= BigInt(minIndexRows)).getOrElse(
            GraftIndexCatalog.cachedProbe(scanPaths(kj.left), minIndexRows) {
              !graft.graphops.LocalKernel.within(
                data.select(col(kj.idCol)), minIndexRows - 1)
            })

      val rewritten = Option(())
        .filter(_ => indexEligible(kj.left))
        .flatMap(_ => GraftIndexCatalog.lookup(scanPaths(kj.left)))
        .filter(_ => bigEnoughForIndex)
        .flatMap(e => layoutOf(e.indexPath) match {
          case Some("hnsw") => hnswRoute(e)
          case Some("ivf") => ivfRoute(e)
          case _ => None
        })
        .getOrElse(BruteForceKnn.knnJoin(data, queries, kj.k, metric, kj.idCol, kj.vecCol))
      val shaped = rewritten.select(col("qid").cast("long"), col("nbr_id").cast("long"),
        col("rank"), col("dist"))
      val newPlan = B.optimizedPlanOf(shaped)
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
