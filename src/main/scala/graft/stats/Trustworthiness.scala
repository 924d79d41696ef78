package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.ops.BruteForceKnn

/** Trustworthiness — `cuvs::stats::trustworthiness_score`
  * (trustworthiness_score.hpp:20-31): how well an embedding preserves
  * local structure. T = 1 - 2/(n*k*(2n-3k-1)) * sum over queries q and
  * over j in kNN_k(q, embedded) \ kNN_k(q, orig) of (rank_orig(q,j) - k).
  *
  * Relational shape: two kNN joins (orig + embedded space, self excluded)
  * -> anti-join the rank lists -> penalty sum. The orig-space ranks come
  * from the full window form (ranks beyond k are needed for the penalty).
  */
object Trustworthiness {

  def score(orig: DataFrame, embedded: DataFrame, k: Int,
      metric: Metric = Metric.L2Sqrt,
      idCol: String = "id", origVecCol: String = "vec", embVecCol: String = "evec"): Double = {
    val n = orig.count()
    val o = orig.select(col(idCol).cast("long").as("id"), col(origVecCol).as("vec"))
    val e = embedded.select(col(idCol).cast("long").as("id"), col(embVecCol).as("vec"))
    val qe = e.select(col("id").as("qid"), col("vec").as("qvec"))
    val embTopK = BruteForceKnn.knnJoin(e, qe, k + 1, metric)
      .filter(col("qid") =!= col("nbr_id"))
      .withColumn("erank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("rank"))))
      .filter(col("erank") <= k)
      .select(col("qid"), col("nbr_id"))
    // Only the orig-space ranks of those n·k pairs are needed, and each is
    // a closer-count: orank(q,j) among others = 1 + #{b != q : (d_qb, b)
    // <lex (d_qj, j)} — the row_number tie-break mirrored as a counting
    // aggregate. This replaces the full n² window sort (all ranks
    // materialized + shuffled) with one broadcast-join aggregation whose
    // groups are the n·k pairs; the n² distance evaluations remain
    // embarrassingly parallel over the dataset side.
    val pairs = embTopK
      .join(o.select(col("id").as("qid"), col("vec").as("_qvec")), "qid")
      .join(o.select(col("id").as("nbr_id"), col("vec").as("_jvec")), "nbr_id")
      .select(col("qid"), col("nbr_id"),
        graft.functions.vector_distance(metric, col("_qvec"), col("_jvec")).as("_dqj"))
    // The n·k thresholds broadcast (same bound as the query side of any
    // brute-force search); the dataset side STREAMS through one
    // mapPartitions with per-partition count accumulators — each (q, b)
    // distance evaluated once, no row explosion, and the only shuffled
    // data is the per-partition count matrix (n·k longs).
    val spark = orig.sparkSession
    import spark.implicits._
    val qs: Array[(Long, Array[Float], Array[(Long, Double)])] = pairs
      .groupBy(col("qid"))
      .agg(collect_list(struct(col("nbr_id").as("_1"), col("_dqj").as("_2"))).as("_nbrs"))
      .join(o.select(col("id").as("qid"), col("vec").as("_qvec")), "qid")
      .select(col("qid"), col("_qvec"), col("_nbrs"))
      .as[(Long, Array[Float], Array[(Long, Double)])]
      .collect()
    val bcQ = spark.sparkContext.broadcast(qs)
    val distFn = graft.core.Distance.fn(metric)
    val minClose = Metric.isMinClose(metric)
    // spread the streamed side over the cluster — the file scan may arrive
    // in one partition at small scale, which would serialize the kernel
    val nParts = spark.sparkContext.defaultParallelism
    val partCounts = o.repartition(nParts).as[(Long, Array[Float])].mapPartitions { it =>
      val queries = bcQ.value
      val acc = queries.map(q => new Array[Long](q._3.length))
      it.foreach { case (bid, bvec) =>
        var qi = 0
        while (qi < queries.length) {
          val (qid, qvec, nbrs) = queries(qi)
          if (bid != qid) {
            val d = distFn(qvec, bvec)
            var ni = 0
            while (ni < nbrs.length) {
              val (jid, dqj) = nbrs(ni)
              val closer =
                if (minClose) d < dqj || (d == dqj && bid < jid)
                else d > dqj || (d == dqj && bid < jid)
              if (closer) acc(qi)(ni) += 1
              ni += 1
            }
          }
          qi += 1
        }
      }
      acc.iterator.zipWithIndex.flatMap { case (row, qi) =>
        row.iterator.zipWithIndex.collect { case (c, ni) if c > 0 => (qi, ni, c) }
      }
    }.collect()
    val total = qs.map(q => new Array[Long](q._3.length))
    partCounts.foreach { case (qi, ni, c) => total(qi)(ni) += c }
    // orank = closer-count + 1; penalty = sum of (orank - k)+
    val penalty = total.flatMap(_.iterator.map(c => math.max(c + 1 - k, 0L))).sum
    1.0 - 2.0 * penalty / (n.toDouble * k * (2.0 * n - 3.0 * k - 1.0))
  }
}
