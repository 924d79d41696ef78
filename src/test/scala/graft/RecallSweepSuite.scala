package graft

import graft.tools.RecallSweep

/** Floor + Pareto-shape assertions over the recall-vs-knob sweep
  * (comparing_indexes.md:29-40): every index family, at the search knob
  * its driver query defaults to, must clear that query's recall floor;
  * and along each family's knob the recall curve must be (weakly)
  * non-decreasing — the Pareto property that makes "compare at equal
  * recall" meaningful. The committed RECALL_PARETO.json artifact is the
  * same sweep run at sf0.1.
  */
class RecallSweepSuite extends SparkFunSuite {

  private lazy val points = RecallSweep.sweep(spark, SparkTestBase.sf0001)

  // (family, driver-default knob value, driver floor)
  private val defaults = Seq(
    ("ivf_flat", 8, 0.70),
    ("ivf_sq", 8, 0.70),
    ("ivf_pq", 8, 0.70),
    // refine-backed rows (kCoarse = n/3, the flagship gate's reorder
    // depth): the exhaustive end must recover the reference's >=0.95
    // bucket that the shallow n/10 reorder caps out under
    ("ivf_pq_refine", 16, 0.95),
    ("ivf_rabitq", 8, 0.70),
    ("scann", 4, 0.60),
    // full probes at the 8-bit default estimator: the r6 verdict bar for
    // closing the SOAR/ADC recall plateau
    ("scann", 16, 0.93),
    ("cagra", 40, 0.85),
    ("hnsw", 40, 0.85),
    ("vamana", 40, 0.85),
    // reference-shaped builds (2:1 intermediate:degree discipline,
    // cagra.hpp:149-153 / vamana.hpp:49-82): ceilings must clear the
    // reference's own floors — CAGRA 0.95 (ann_cagra.cuh:271,473),
    // Vamana 0.9 at its default shape
    ("cagra_ref", 60, 0.95),
    ("vamana_ref", 60, 0.90),
  )

  test("every family clears its driver floor at the default search knob") {
    val byKey = points.map(p => (p.family, p.value) -> p.recall).toMap
    defaults.foreach { case (family, knob, floor) =>
      val r = byKey.getOrElse((family, knob),
        fail(s"sweep has no point for $family@$knob"))
      assert(r >= floor, f"$family@$knob recall $r%.3f below floor $floor")
    }
  }

  test("bucket rows sit inside their bucket and are their family's fastest") {
    val buckets = RecallSweep.toBuckets(points)
    assert(buckets.nonEmpty)
    val edges = Map("80-89" -> (0.80, 0.90), "90-94" -> (0.90, 0.95),
      "95-98" -> (0.95, 0.99), "99+" -> (0.99, 1.01))
    buckets.foreach { b =>
      val (lo, hi) = edges(b.bucket)
      assert(b.recall >= lo && b.recall < hi, s"$b outside its bucket")
      val peers = points.filter(p => p.family == b.family &&
        p.recall >= lo && p.recall < hi)
      assert(b.searchSec == peers.map(_.searchSec).min,
        s"$b is not its bucket's fastest point")
    }
    // the reference-shaped builds must populate the top bucket
    assert(buckets.exists(b => b.family == "cagra_ref" && b.bucket == "99+"))
  }

  test("recall is non-decreasing along each family's knob (Pareto shape)") {
    points.groupBy(_.family).foreach { case (family, ps) =>
      val sorted = ps.sortBy(_.value)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          // 0.02 tolerance: ADC estimates can reorder the coarse set by a
          // hair as probes widen; the curve must still trend upward
          assert(b.recall >= a.recall - 0.02,
            f"$family recall drops ${a.value}:${a.recall}%.3f -> ${b.value}:${b.recall}%.3f")
        case _ => ()
      }
      // the exhaustive end must dominate the fast end outright
      assert(sorted.last.recall >= sorted.head.recall,
        s"$family exhaustive knob worse than fastest knob")
    }
  }
}
