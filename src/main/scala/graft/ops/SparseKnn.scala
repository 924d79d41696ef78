package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric

/** Sparse brute-force kNN over CSR-style rows — `cuvs::neighbors::
  * brute_force` sparse surface (brute_force.hpp:604-695, engine
  * detail/sparse_knn.cuh; SURVEY.md §1.1 sparse mapping:
  * (id, indices array<int>, values array<float>)).
  *
  * Relational shape — a genuinely better fit for Spark than dense
  * (SURVEY.md §2.3): explode nonzeros into an inverted index
  * (dim -> (id, value)), equi-join query nonzeros on dim, partial dot
  * products via groupBy(qid, id) sum, then expanded-form distance
  * d^2 = |q|^2 + |x|^2 - 2<q,x> (the reference's norms trick,
  * distance.hpp:21-24) and per-query top-k. Only co-occurring dims are
  * ever touched; rows sharing no dimension never meet.
  *
  * Candidate semantics note: rows with zero overlap have d^2 =
  * |q|^2 + |x|^2; they only enter the top-k when fewer than k overlapping
  * rows exist — handled by unioning norm-only candidates for such queries
  * (exactness preserved).
  */
object SparseKnn {

  /** (id, dim, value) inverted index of nonzeros. */
  private def nonzeros(df: DataFrame, idCol: String, idxCol: String, valCol: String) =
    df.select(col(idCol).cast("long").as("id"),
        explode(arrays_zip(col(idxCol), col(valCol))).as("z"))
      .select(col("id"), col(s"z.$idxCol").cast("int").as("dim"),
        col(s"z.$valCol").cast("double").as("v"))

  private def norms(nz: DataFrame) =
    nz.groupBy(col("id")).agg(sum(col("v") * col("v")).as("norm2"))

  /** Exact top-k under squared-L2 (metric = L2) or cosine distance.
    * queries/dataset: (id, indices, values). Returns (qid, nbr_id, rank, dist). */
  def knnJoin(dataset: DataFrame, queries: DataFrame, k: Int,
      metric: Metric = Metric.L2,
      idCol: String = "id", idxCol: String = "indices", valCol: String = "values",
      qidCol: String = "qid", qidxCol: String = "qindices", qvalCol: String = "qvalues"): DataFrame = {
    require(metric == Metric.L2 || metric == Metric.Cosine,
      s"sparse kNN supports L2 / Cosine, got $metric")
    val dnz = nonzeros(dataset, idCol, idxCol, valCol)
    val qnzRaw = nonzeros(queries, qidCol, qidxCol, qvalCol)
    val qnz = qnzRaw.withColumnsRenamed(Map("id" -> "qid", "v" -> "qv"))
    val dn = norms(dnz)
    val qn = norms(qnzRaw).withColumnsRenamed(Map("id" -> "qid", "norm2" -> "qnorm2"))
    val dots = broadcast(qnz).join(dnz, "dim")
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("qv") * col("v")).as("dot"))
    // overlap candidates with expanded-form distance
    val overlap = dots
      .join(broadcast(qn), "qid").join(dn, "id")
      .select(col("qid"), col("id"), distExpr(metric).as("dist"))
      .localCheckpoint() // read 3x below (top-k, fallback guard, anti-join)
    // zero-overlap fallback: every (query, row) at dot = 0 — only needed
    // when a query overlaps fewer than k rows; cheap guard at small k
    val needFallback = qn.select(col("qid"))
      .join(overlap.groupBy(col("qid")).count(), Seq("qid"), "left")
      .filter(coalesce(col("count"), lit(0L)) < k).select(col("qid"))
    val fallback = broadcast(needFallback.join(qn, "qid"))
      .crossJoin(dn)
      .withColumn("dot", lit(0.0))
      .select(col("qid"), col("id"), distExpr(metric).as("dist"))
      .join(dots.select(col("qid"), col("id")), Seq("qid", "id"), "left_anti")
    val pairs = overlap.unionByName(fallback)
      .select(col("qid"), col("id").as("_nid"), col("dist"))
    BruteForceKnn.topKPerQuery(pairs, k, metric)
  }

  private def distExpr(metric: Metric) = metric match {
    case Metric.L2 => col("qnorm2") + col("norm2") - lit(2.0) * col("dot")
    case _ => // cosine
      when(col("qnorm2") === 0 || col("norm2") === 0, lit(1.0))
        .otherwise(lit(1.0) - col("dot") / sqrt(col("qnorm2") * col("norm2")))
  }

  /** Sparse pairwise distances (expanded form) for all overlapping pairs —
    * the sparse `pairwise_distance` (distance.hpp sparse region). */
  def pairwiseOverlap(a: DataFrame, b: DataFrame, metric: Metric = Metric.L2,
      idCol: String = "id", idxCol: String = "indices", valCol: String = "values"): DataFrame = {
    val anz = nonzeros(a, idCol, idxCol, valCol)
      .withColumnsRenamed(Map("id" -> "qid", "v" -> "qv"))
    val bnz = nonzeros(b, idCol, idxCol, valCol)
    val an = anz.groupBy(col("qid")).agg(sum(col("qv") * col("qv")).as("qnorm2"))
    val bn = norms(bnz)
    anz.join(bnz, "dim")
      .groupBy(col("qid"), col("id")).agg(sum(col("qv") * col("v")).as("dot"))
      .join(broadcast(an), "qid").join(bn, "id")
      .select(col("qid").as("aid"), col("id").as("bid"), distExpr(metric).as("dist"))
  }
}
