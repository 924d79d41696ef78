package graft.tools

/** The reference protocol's recall buckets (comparing_indexes.md:29-40) —
  * ONE definition shared by the two committed Pareto artifacts
  * (ANN_BENCH.json via [[AnnBench.toBuckets]], RECALL_PARETO.json via
  * [[RecallSweep.toBuckets]]) so their bucket semantics can never drift
  * apart. */
object RecallBuckets {

  /** (label, lo inclusive, hi exclusive); 1.01 admits recall == 1.0. */
  val edges: Seq[(String, Double, Double)] = Seq(
    ("80-89", 0.80, 0.90), ("90-94", 0.90, 0.95),
    ("95-98", 0.95, 0.99), ("99+", 0.99, 1.01))

  /** Group `rows` by `key` and, within each (key, bucket), keep the row
    * `pickBest` selects — the protocol's "compare within a bucket, never
    * across" view. Output ordered by key, then bucket edge order. */
  def best[A, K: Ordering](rows: Seq[A], recall: A => Double, key: A => K)(
      pickBest: Seq[A] => A): Seq[(K, String, A)] =
    rows.groupBy(key).toSeq.sortBy(_._1).flatMap { case (k, rs) =>
      edges.flatMap { case (label, lo, hi) =>
        val in = rs.filter(r => recall(r) >= lo && recall(r) < hi)
        if (in.isEmpty) None else Some((k, label, pickBest(in)))
      }
    }
}
