package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Structural "did this query actually read the saved index" check —
  * replaces plan-STRING sniffing (`toString.contains("list_id")`), which a
  * column rename or plan-format change flips vacuously true or false. The
  * check walks the EXECUTED physical plan for a file scan whose root path
  * lives under the registered index directory, descending through the
  * leaf-like wrappers `SparkPlan.collect` stops at (AQE plan, query
  * stages, exchange reuse, cached relations). Used by the
  * `knn_join_indexed*` correctness gates and the route-shape suite pins.
  */
object IndexRoute {

  /** Root paths of every parquet/file scan reachable from `plan`. */
  def executedScanPaths(plan: SparkPlan): Seq[String] = {
    val here = plan.collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
    // collect() does not descend into these wrappers' inner plans
    val nested = plan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        executedScanPaths(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        executedScanPaths(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        executedScanPaths(r.child)
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        executedScanPaths(m.relation.cachedPlan)
    }.flatten
    here ++ nested
  }

  private def normalize(p: String): String = p.stripPrefix("file:").stripSuffix("/")

  /** True when the frame actually routed through the index at `indexPath`
    * — the earned form of `index_routed`. Two signals, either suffices:
    * (a) structural — the executed plan reads files under the layout's
    * directory (the IVF-family routes' pruned list scan); (b) the
    * rewrite-time route marker — the routes that materialize the index
    * while PLANNING (the HNSW local-kernel beam collects the hierarchy
    * during the rewrite) leave no index scan in the executed plan, so the
    * resolver records the decision at the moment the non-brute branch
    * builds the plan. Forcing `executedPlan` here runs the optimizer on
    * THIS thread, so the marker read after it is the one this frame's own
    * rewrite set; the marker's node exprIds must additionally match THIS
    * frame's analyzed KnnJoinPlan node, so a stale marker from whatever
    * query last planned on the thread can never be claimed falsely. */
  def routedThrough(df: DataFrame, indexPath: String): Boolean = {
    val idx = normalize(indexPath)
    val structural = executedScanPaths(df.queryExecution.executedPlan).map(normalize)
      .exists(p => p == idx || p.startsWith(idx + "/"))
    structural || markerMatches(df, indexPath)
  }

  /** The marker-only half of [[routedThrough]] — for consumers whose
    * frame was already materialized (a localCheckpoint erases the plan,
    * so the structural walk has nothing to see): pass the PRE-checkpoint
    * frame, whose analyzed plan still carries the KnnJoinPlan node(s) the
    * markers' exprIds must match. Markers are PER NODE: every kNN node in
    * the frame must have routed through `indexPath` — a frame mixing one
    * routed and one brute-lowered node does not earn the bit. Does not
    * force planning by itself — the caller must have planned/executed the
    * query (any thread: the marker map is global, keyed by exprIds). */
  def markerMatches(df: DataFrame, indexPath: String): Boolean = {
    val idx = normalize(indexPath)
    val nodes: Seq[Seq[Long]] = df.queryExecution.analyzed.collect {
      case k: KnnJoinPlan => k.output.map(_.exprId.id)
    }
    nodes.nonEmpty && nodes.forall(ids =>
      GraftIndexCatalog.routeMarkerFor(ids).exists { case (_, p) =>
        // prefix match, like the structural walk: a tiered layout's route
        // records the resolved live VERSION directory under the
        // registered root (TieredIndex.resolveLive)
        val n = normalize(p)
        n == idx || n.startsWith(idx + "/")
      })
  }
}
