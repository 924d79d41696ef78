package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.cluster.KMeans
import graft.core.Metric
import graft.expr.{PqAdc, PqCodebooks, PqDecode, PqEncode, PqLut}
import org.apache.spark.sql.graft.{bridge => B}

/** Product quantization — `cuvs::preprocessing::quantize::pq`
  * (pq.hpp:34-140 params: pq_bits in [4,16], pq_dim default dim/4,
  * max_train_points_per_pq_code=256; :205 transform, :239 inverse).
  *
  * train = `pqDim` independent k-means fits over sliced subvectors (each on
  * the same sampled trainset — one Spark job per subspace, k = 2^pq_bits
  * centers); transform/inverse/ADC are map-side codegen expressions.
  */
object ProductQuantizer {

  case class Params(pqDim: Int = 8, pqBits: Int = 8, kmeansIters: Int = 10,
      maxTrainPointsPerCode: Int = 256, seed: Long = 42)

  /** All-subspaces-at-once Lloyd: each iteration is ONE distributed pass —
    * encode every row against the current codebooks (PqEncode), posexplode
    * the per-subspace codes, and take the fused vector mean of each
    * (subspace, code) group. pqDim independent k-means runs thus cost
    * 2 jobs/iteration total instead of 2 jobs/iteration/subspace. */
  def train(df: DataFrame, params: Params,
      idCol: String = "id", vecCol: String = "vec"): PqCodebooks = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % params.pqDim == 0, s"dim $dim not divisible by pqDim ${params.pqDim}")
    val subLen = dim / params.pqDim
    val nCenters = 1 << params.pqBits
    // cap the trainset like the reference (max_train_points_per_pq_code)
    val maxRows = nCenters.toLong * params.maxTrainPointsPerCode
    val n = df.count()
    val trainset = if (n <= maxRows) df else df.filter(
      pmod(xxhash64(col(idCol), lit(params.seed)), lit(n)) < maxRows)
    val data = trainset.select(col(idCol).as("_id"), col(vecCol).as("_vec"))
      .transform(graft.core.Frames.materialize(_))
    try {
      // deterministic seeded init: center c of subspace s = subvector s of
      // the c-th hash-ranked row
      val initRows = data.orderBy(xxhash64(col("_id"), lit(params.seed)), col("_id"))
        .limit(nCenters).select(col("_vec")).collect()
        .map(_.getSeq[Float](0).toArray)
      var books = new Array[Float](params.pqDim * nCenters * subLen)
      for (c <- initRows.indices; s <- 0 until params.pqDim)
        System.arraycopy(initRows(c), s * subLen, books, (s * nCenters + c) * subLen, subLen)

      // Cost-based route (graft.graphops.LocalKernel): the per-iteration
      // state is the codebooks (pqDim·2^bits·subLen floats) — on a
      // collectable trainset the fused-update jobs are pure scheduling
      // overhead. Same init, same strict-argmin encode (PqOps.encode
      // semantics), same double-sum subvector means, same
      // keep-on-empty-cell rule; the distributed loop remains the
      // at-scale path.
      val sparkS = df.sparkSession
      if (graft.graphops.LocalKernel.enabled(sparkS) &&
          graft.graphops.LocalKernel.within(data,
            graft.graphops.LocalKernel.maxVectors(sparkS)))
        return trainLocal(data, books, params, nCenters, subLen)

      for (_ <- 1 to params.kmeansIters) {
        val cb = PqCodebooks(books, params.pqDim, nCenters, subLen)
        val updated = data
          .select(posexplode(encodeCol(col("_vec"), cb)).as(Seq("s", "c")), col("_vec"))
          .select(col("s"), col("c"),
            slice(col("_vec"), col("s") * subLen + 1, lit(subLen)).as("_sub"))
          .groupBy(col("s"), col("c"))
          .agg(graft.core.VectorAgg.vectorAvg(col("_sub")).as("mean"))
          .collect()
        val next = books.clone()
        updated.foreach { r =>
          val mean = r.getSeq[Float](2).toArray
          if (mean.nonEmpty)
            System.arraycopy(mean, 0, next, (r.getInt(0) * nCenters + r.getInt(1)) * subLen, subLen)
        }
        books = next
      }
      PqCodebooks(books, params.pqDim, nCenters, subLen)
    } finally data.unpersist()
  }

  /** In-memory twin of the fused distributed update loop, id-sorted
    * summation order. */
  private def trainLocal(data: DataFrame, init: Array[Float], params: Params,
      nCenters: Int, subLen: Int): PqCodebooks = {
    val rows = data.select(col("_id").cast("long"), col("_vec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)
    var books = init
    for (_ <- 1 to params.kmeansIters) {
      val sums = new Array[Double](params.pqDim * nCenters * subLen)
      val counts = new Array[Long](params.pqDim * nCenters)
      // subspaces are independent k-means problems writing disjoint
      // (subspace, center) cells — run them on parallel threads; each
      // cell is still accumulated by exactly one thread in id-sorted row
      // order, so the float summation is bit-identical to the serial loop
      val booksNow = books
      java.util.stream.IntStream.range(0, params.pqDim).parallel().forEach { s =>
        rows.foreach { v =>
          // PqOps.encode: strict-argmin squared L2, first center wins ties
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < nCenters) {
            val off = (s * nCenters + c) * subLen
            var d = 0.0; var j = 0
            while (j < subLen) {
              val t = v(s * subLen + j).toDouble - booksNow(off + j)
              d += t * t; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          val cell = s * nCenters + best
          var j = 0
          while (j < subLen) { sums(cell * subLen + j) += v(s * subLen + j); j += 1 }
          counts(cell) += 1
        }
      }
      val next = books.clone()
      var cell = 0
      while (cell < counts.length) {
        if (counts(cell) > 0) {
          var j = 0
          while (j < subLen) {
            next(cell * subLen + j) = (sums(cell * subLen + j) / counts(cell)).toFloat
            j += 1
          }
        }
        cell += 1
      }
      books = next
    }
    PqCodebooks(books, params.pqDim, nCenters, subLen)
  }

  def encodeCol(vec: Column, cb: PqCodebooks): Column =
    B.column(PqEncode(B.expression(vec), cb))
  /** Anisotropic encode (residual, unit row direction) for MIPS builds —
    * see PqOps.encodeAniso. */
  def encodeAnisoCol(res: Column, unit: Column, cb: PqCodebooks,
      eta: Double): Column =
    B.column(graft.expr.PqEncodeAniso(B.expression(res), B.expression(unit), cb, eta))
  def decodeCol(codes: Column, cb: PqCodebooks): Column =
    B.column(PqDecode(B.expression(codes), cb))
  def lutCol(qvec: Column, cb: PqCodebooks): Column =
    B.column(PqLut(B.expression(qvec), cb))
  /** Inner-product LUT over (RAW query, probed list id) — see PqOps.lutIp. */
  def lutIpCol(qvec: Column, listId: Column, cb: PqCodebooks,
      cs: graft.expr.CentroidSet): Column =
    B.column(graft.expr.PqLutIp(B.expression(qvec),
      B.expression(listId.cast("int")), cb, cs))
  def adcCol(lut: Column, codes: Column, cb: PqCodebooks): Column =
    adcCol(lut, codes, cb.nCenters)
  def adcCol(lut: Column, codes: Column, nCenters: Int): Column =
    B.column(PqAdc(B.expression(lut), B.expression(codes), nCenters))

  def transform(df: DataFrame, cb: PqCodebooks, vecCol: String = "vec",
      outCol: String = "pq_codes"): DataFrame =
    df.withColumn(outCol, encodeCol(col(vecCol), cb))

  def inverseTransform(df: DataFrame, cb: PqCodebooks, codesCol: String = "pq_codes",
      outCol: String = "vec_hat"): DataFrame =
    df.withColumn(outCol, decodeCol(col(codesCol), cb))

  /** Mean squared reconstruction error — the train-quality scalar. */
  def reconstructionError(df: DataFrame, cb: PqCodebooks, vecCol: String = "vec"): Double = {
    val rec = decodeCol(encodeCol(col(vecCol), cb), cb)
    df.select(graft.functions.vector_distance(Metric.L2, col(vecCol), rec).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
  }

  // ===== optional coarse VQ stage (pq.hpp use_vq / vq_n_centers) ========

  /** Two-stage quantizer of the standalone PQ surface (pq.hpp:34-140:
    * `use_vq`, `vq_n_centers` default ~sqrt(n)): a coarse vector quantizer
    * (our k-means) followed by PQ on the residuals — the same
    * center-then-residual composition the IVF-PQ index uses, exposed as a
    * preprocessing transform. */
  case class VqModel(centroids: graft.expr.CentroidSet, codebooks: PqCodebooks)
      extends Serializable

  def trainVq(df: DataFrame, params: Params, vqCenters: Int,
      idCol: String = "id", vecCol: String = "vec"): VqModel = {
    val km = KMeans.fit(df, KMeans.Params(k = vqCenters, maxIter = params.kmeansIters,
      seed = params.seed), idCol, vecCol)
    val res = df.select(col(idCol).as("_id"),
      B.column(graft.expr.CentroidResidual(
        B.expression(col(vecCol)),
        B.expression(KMeans.assignCols(km.centroids, col(vecCol))._1),
        km.centroids)).as("_res"))
    VqModel(km.centroids, train(res, params, "_id", "_res"))
  }

  /** (vq_code int, pq_codes array<int>) per row. */
  def transformVq(df: DataFrame, m: VqModel, vecCol: String = "vec"): DataFrame = {
    val vq = KMeans.assignCols(m.centroids, col(vecCol))._1
    df.withColumn("vq_code", vq)
      .withColumn("pq_codes", encodeCol(
        B.column(graft.expr.CentroidResidual(B.expression(col(vecCol)),
          B.expression(col("vq_code")), m.centroids)), m.codebooks))
  }

  /** Reconstruction: VQ center + decoded PQ residual. */
  def inverseTransformVq(df: DataFrame, m: VqModel, outCol: String = "vec_hat"): DataFrame = {
    val center = B.column(graft.expr.CentroidVector(
      B.expression(col("vq_code")), m.centroids))
    df.withColumn(outCol,
      zip_with(center, decodeCol(col("pq_codes"), m.codebooks), (a, b) => a + b)
        .cast("array<float>"))
  }
}
