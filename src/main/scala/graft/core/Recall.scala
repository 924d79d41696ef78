package graft.core

import org.apache.spark.sql.DataFrame

/** Recall@k bookkeeping — `matched / (n_queries · k)` against exact ground
  * truth (fern/pages/comparing_indexes.md:19, benchmark.hpp:352-400).
  *
  * Both sides are materialized once (eager localCheckpoint) before the
  * intersect: without it, `approx.intersect(exact).count()` re-runs the
  * full approximate search AND the exact ground-truth job a second time —
  * the two most expensive plans in any recall report.
  */
object Recall {

  /** Cost-based route (graft.graphops.LocalKernel): recall operands are
    * n_queries·k id pairs — a few thousand rows — yet the distributed
    * INTERSECT pays a hash-aggregate + exchange pair per side (r18: 4-6
    * jobs per recall gate, pure scheduling at bench scale). Both sides are
    * still materialized exactly once (the checkpoint below), so the probe
    * and collect read checkpoint blocks, never re-run the search plans.
    * INTERSECT is set-semantics on both routes (distinct common rows, Row
    * equality by value). Over the cap the distributed intersect runs
    * unchanged. Returns None over the cap or with the kernel disabled. */
  private def localIntersect(a: DataFrame, e: DataFrame): Option[(Long, Long)] = {
    val spark = a.sparkSession
    import graft.graphops.LocalKernel
    if (!LocalKernel.enabled(spark)) return None
    val cap = LocalKernel.maxEdges(spark)
    if (!LocalKernel.within(a, cap) || !LocalKernel.within(e, cap)) return None
    val eRows = e.collect()
    val as: Set[Seq[Any]] = a.collect().iterator.map(_.toSeq).toSet
    val es: Set[Seq[Any]] = eRows.iterator.map(_.toSeq).toSet
    Some((as.count(es.contains).toLong, eRows.length.toLong))
  }

  /** |approx ∩ exact| with each side computed exactly once. */
  def matched(approx: DataFrame, exact: DataFrame): Long = {
    val a = approx.localCheckpoint()
    val e = exact.localCheckpoint()
    localIntersect(a, e).map(_._1).getOrElse(a.intersect(e).count())
  }

  /** matched / |exact| (the graph-recall form: ground truth size is the
    * denominator — ALL rows of `exact`, duplicates included, exactly as
    * e.count() reads them). */
  def vsExact(approx: DataFrame, exact: DataFrame): Double = {
    val a = approx.localCheckpoint()
    val e = exact.localCheckpoint()
    localIntersect(a, e) match {
      case Some((m, en)) => m.toDouble / en
      case None => a.intersect(e).count().toDouble / e.count()
    }
  }
}
