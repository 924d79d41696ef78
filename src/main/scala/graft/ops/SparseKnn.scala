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

    // Fused select_k kernel (graft.graphops.LocalKernel): when the query
    // side fits in memory, broadcast it as an inverted index
    // (dim -> (query slot, value)) and stream the dataset rows through one
    // mapPartitions that accumulates per-row dot products against every
    // query via dim lookups and keeps a TopKBuf per query — the sparse twin
    // of BruteForceKnn's fused kernel (reference: detail/sparse_knn.cuh
    // batches). Only parts·|Q|·k candidates reach the final merge, instead
    // of the full exploded (qid, id) co-occurrence stream through a hash
    // aggregate. Distances are computed for EVERY (query, row) pair
    // (zero-overlap pairs via dot = 0), so the zero-overlap fallback is
    // exact here even under negative values.
    val spark = dataset.sparkSession
    val qk = queries.select(col(qidCol).cast("long").as("qid"),
      col(qidxCol).as("qindices"), col(qvalCol).as("qvalues"))
      .transform(graft.core.Frames.materialize(_))
    if (graft.graphops.LocalKernel.enabled(spark) &&
        graft.graphops.LocalKernel.within(qk,
          graft.graphops.LocalKernel.maxVectors(spark))) {
      try return knnJoinLocal(dataset, qk, k, metric, idCol, idxCol, valCol)
      finally qk.unpersist()
    }
    qk.unpersist()

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
      .localCheckpoint() // read twice below (top-k union, anti-join)
    // Zero-overlap fallback: a row sharing no dimension scores dot = 0, so
    // its distance ranks by (norm2, id) under L2 and (1.0 -> id) under
    // cosine. For NONNEGATIVE values (TF/counts — the sparse norm) any
    // zero-overlap row that can enter a true top-k must then be among the
    // global k best under that ranking, so ONE tiny global top-k unioned
    // for every query makes the route exact — including when a query
    // overlaps more than k rows but a small-norm disjoint row still beats
    // its k-th overlap (a case a "fewer-than-k overlaps" guard misses).
    // Signed values route through the broadcast kernel (all-pairs, exact).
    val gfOrd: Seq[org.apache.spark.sql.Column] = metric match {
      case Metric.L2 => Seq(col("norm2").asc, col("id").asc)
      case _ => Seq(col("id").asc)
    }
    val globalFallback = dn.orderBy(gfOrd: _*).limit(k)
    val fallback = broadcast(qn)
      .crossJoin(broadcast(globalFallback))
      .withColumn("dot", lit(0.0))
      .select(col("qid"), col("id"), distExpr(metric).as("dist"))
      .join(dots.select(col("qid"), col("id")), Seq("qid", "id"), "left_anti")
    val pairs = overlap.unionByName(fallback)
      .select(col("qid"), col("id").as("_nid"), col("dist"))
    BruteForceKnn.topKPerQuery(pairs, k, metric)
  }

  /** Broadcast-queries kernel: one pass over the (streaming, never
    * collected) dataset side; per-row dots via the query inverted index,
    * expanded-form distance for every query, per-query bounded heaps. */
  private def knnJoinLocal(dataset: DataFrame, qk: DataFrame, k: Int, metric: Metric,
      idCol: String, idxCol: String, valCol: String): DataFrame = {
    val spark = dataset.sparkSession
    import spark.implicits._
    val qArr = qk.as[(Long, Array[Int], Array[Float])].collect()
    val nQ = qArr.length
    val qids = qArr.map(_._1)
    val qnorm2 = new Array[Double](nQ)
    // dim -> packed (query slot, value) posting lists
    val postTmp = new java.util.HashMap[Int, (scala.collection.mutable.ArrayBuffer[Int],
      scala.collection.mutable.ArrayBuffer[Double])]()
    var qi = 0
    while (qi < nQ) {
      val (_, idxs, vals) = qArr(qi)
      var j = 0
      while (j < idxs.length) {
        val v = vals(j).toDouble
        qnorm2(qi) += v * v
        var p = postTmp.get(idxs(j))
        if (p == null) {
          p = (new scala.collection.mutable.ArrayBuffer[Int](),
            new scala.collection.mutable.ArrayBuffer[Double]())
          postTmp.put(idxs(j), p)
        }
        p._1 += qi; p._2 += v
        j += 1
      }
      qi += 1
    }
    val posting = new java.util.HashMap[Int, (Array[Int], Array[Double])](postTmp.size * 2)
    postTmp.forEach((d, p) => posting.put(d, (p._1.toArray, p._2.toArray)))
    val bcPost = spark.sparkContext.broadcast(posting)
    val bcQn = spark.sparkContext.broadcast(qnorm2)
    val bcQids = spark.sparkContext.broadcast(qids)
    val minClose = Metric.isMinClose(metric)
    val isL2 = metric == Metric.L2
    val d = dataset.select(col(idCol).cast("long").as("id"),
      col(idxCol).cast("array<int>").as("indices"), col(valCol).cast("array<float>").as("values"))
    // spread a small scan across cores; plan stats are unreliable here (the
    // sparse columns are expression-derived, inflating sizeInBytes), so ask
    // the planned RDD — partition count only, no job runs
    val cores = spark.sparkContext.defaultParallelism
    val dIn = if (d.rdd.getNumPartitions < cores) d.repartition(cores) else d
    val pairs = dIn.as[(Long, Array[Int], Array[Float])].mapPartitions { rows =>
      val post = bcPost.value; val qn = bcQn.value; val ids = bcQids.value
      val n = ids.length
      val bufs = Array.fill(n)(graft.core.TopKBuf(k, minClose,
        new Array[Double](k), new Array[Long](k), 0))
      val dots = new Array[Double](n)
      val touched = new Array[Int](n)
      rows.foreach { case (rid, idxs, vals) =>
        var nTouched = 0
        var norm2 = 0.0
        var j = 0
        while (j < idxs.length) {
          val v = vals(j).toDouble
          norm2 += v * v
          val p = post.get(idxs(j))
          if (p != null) {
            val slots = p._1; val qvs = p._2
            var t = 0
            while (t < slots.length) {
              val s = slots(t)
              if (dots(s) == 0.0) { touched(nTouched) = s; nTouched += 1 }
              dots(s) += qvs(t) * v
              t += 1
            }
          }
          j += 1
        }
        var s = 0
        while (s < n) {
          val dot = dots(s)
          val dist =
            if (isL2) qn(s) + norm2 - 2.0 * dot
            else if (qn(s) == 0.0 || norm2 == 0.0) 1.0
            else 1.0 - dot / math.sqrt(qn(s) * norm2)
          bufs(s).insert(dist, rid)
          s += 1
        }
        var t = 0
        while (t < nTouched) { dots(touched(t)) = 0.0; t += 1 }
      }
      bufs.iterator.zipWithIndex.flatMap { case (buf, i) =>
        (0 until buf.size).iterator.map(j => (ids(i), buf.ids(j), buf.dists(j)))
      }
    }.toDF("qid", "_nid", "dist")
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
