package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.functions.vector_distance

/** Candidate re-ranking — `cuvs::neighbors::refine` (refine.hpp:26-68):
  * given coarse candidate ids per query (e.g. from a quantized search),
  * recompute exact distances and keep the top-k.
  *
  * Pure DataFrame op: equi-join candidates to the dataset on id (shuffle or
  * broadcast per Catalyst's choice), distance, per-query top-k. This is
  * also the recall-recovery stage after IVF-PQ (ivf_pq.hpp refine note).
  */
object Refine {

  /** candidates: (qid, id); returns (qid, nbr_id, rank, dist).
    *
    * `broadcastCandidates` pins the candidate⋈dataset join to a broadcast
    * of the CANDIDATE side. Without the hint Catalyst sees an aggregated
    * frame of unknown size and plans a sort-merge join — a full shuffle
    * WRITE of the dataset on id, which at 100 TB is the step that erases
    * the index route's probe-pruning win (AQE's runtime conversion still
    * pays the map-side write of the big relation before it can flip the
    * strategy). Callers set it when they can BOUND the candidate side —
    * the kNN-join planner does for depths where q·depth·16 B sits within
    * the same broadcast budget as the query side the engine already
    * broadcasts everywhere. Default false: an unbounded caller (e.g. a
    * gate refining at kCoarse = n/3) must not OOM the driver. */
  def refine(candidates: DataFrame, dataset: DataFrame, queries: DataFrame,
      k: Int, metric: Metric = Metric.L2Sqrt,
      idCol: String = "id", vecCol: String = "vec",
      qidCol: String = "qid", qvecCol: String = "qvec",
      broadcastCandidates: Boolean = false): DataFrame = {
    val d = dataset.select(col(idCol).cast("long").as("_nid"), col(vecCol).as("_nvec"))
    val q = queries.select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("_qvec"))
    val cand = candidates.select(col("qid").cast("long").as("qid"), col("id").cast("long").as("_nid"))
    val candSide = if (broadcastCandidates) broadcast(cand) else cand
    val pairs = candSide
      .join(d, "_nid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("_nid"),
        vector_distance(metric, col("_qvec"), col("_nvec")).as("dist"))
    BruteForceKnn.topKPerQuery(pairs, k, metric)
  }

  /** Merge row-sharded kNN results — `knn_merge_parts`
    * (knn_merge_parts.hpp:16-40). Input parts: (qid, nbr_id, dist) from
    * independently searched shards; output global (qid, nbr_id, rank, dist).
    * Union + per-query top-k re-select: associativity of the top-k merge
    * makes this exact. */
  def mergeParts(k: Int, metric: Metric, parts: DataFrame*): DataFrame = {
    val all = parts.reduce(_ unionByName _)
      .select(col("qid"), col("nbr_id").as("_nid"), col("dist"))
    BruteForceKnn.topKPerQuery(all, k, metric)
  }
}
