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

  /** |approx ∩ exact| with each side computed exactly once. */
  def matched(approx: DataFrame, exact: DataFrame): Long = {
    val a = approx.localCheckpoint()
    val e = exact.localCheckpoint()
    a.intersect(e).count()
  }

  /** matched / |exact| (the graph-recall form: ground truth size is the
    * denominator). */
  def vsExact(approx: DataFrame, exact: DataFrame): Double = {
    val a = approx.localCheckpoint()
    val e = exact.localCheckpoint()
    a.intersect(e).count().toDouble / e.count()
  }
}
