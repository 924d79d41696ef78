package graft.prep

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.core.Eigen
import graft.expr.{AffineProject, ProjectionMatrix}
import org.apache.spark.sql.graft.{bridge => B}

/** Buffer of raw first/second moments: sum_i x, sum_i x x^T (upper tri). */
case class MomentsBuf(var n: Long, var mean: Array[Double], var upper: Array[Double])

/** One-pass (sum x, sum x x^T) aggregator — the d x d Gram accumulation of
  * PCA fit (preprocessing/pca.hpp:102 fit). Partial buffers are
  * d(d+1)/2 + d doubles, so the shuffle carries one ~33 KB buffer per
  * partition at d=64 regardless of row count — the treeAggregate shape. */
class MomentsAgg(dim: Int) extends Aggregator[Array[Float], MomentsBuf, MomentsBuf] {
  override def zero: MomentsBuf =
    MomentsBuf(0L, new Array[Double](dim), new Array[Double](dim * (dim + 1) / 2))

  override def reduce(b: MomentsBuf, v: Array[Float]): MomentsBuf = {
    var i = 0; var u = 0
    while (i < dim) {
      val xi = v(i).toDouble
      b.mean(i) += xi
      var j = i
      while (j < dim) { b.upper(u) += xi * v(j); j += 1; u += 1 }
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
    var i = 0
    while (i < a.mean.length) { a.mean(i) += b.mean(i); i += 1 }
    i = 0
    while (i < a.upper.length) { a.upper(i) += b.upper(i); i += 1 }
    a.n += b.n
    a
  }

  override def finish(b: MomentsBuf): MomentsBuf = b
  override def bufferEncoder: Encoder[MomentsBuf] = ExpressionEncoder[MomentsBuf]()
  override def outputEncoder: Encoder[MomentsBuf] = ExpressionEncoder[MomentsBuf]()
}

/** PCA — `cuvs::preprocessing::pca` (pca.hpp:23-38 params incl. whiten;
  * :102 fit, :131 fit_transform, :157 transform, :178 inverse_transform).
  *
  * fit = ONE distributed pass (moments aggregator) + driver-side Jacobi
  * eigensolve of the d x d covariance (d ≤ a few K — the reference's SVD is
  * equally single-device at this step); transform/inverse are map-side
  * matrix-multiply expressions over broadcast components.
  */
object PCA {

  case class Model(nComponents: Int, whiten: Boolean,
      mean: Array[Double], components: Array[Array[Double]], // rows = PCs
      explainedVariance: Array[Double], explainedVarianceRatio: Array[Double],
      singularValues: Array[Double], noiseVariance: Double, nSamples: Long)

  def fit(df: DataFrame, nComponents: Int, vecCol: String = "vec",
      whiten: Boolean = false): Model = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val m = df.select(udaf(new MomentsAgg(dim), ExpressionEncoder[Array[Float]]())
      .apply(col(vecCol)).as("m"))
      .select(col("m.n"), col("m.mean"), col("m.upper"))
      .head()
    val n = m.getLong(0)
    val sumX = m.getSeq[Double](1).toArray
    val upper = m.getSeq[Double](2).toArray
    val mean = sumX.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var u = 0
    for (i <- 0 until dim; j <- i until dim) {
      val c = upper(u) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
      u += 1
    }
    val (vals, vecs) = Eigen.symEigen(cov)
    val ev = vals.map(v => math.max(v, 0.0) * n / math.max(n - 1, 1)) // unbiased
    val total = ev.sum
    val noise =
      if (nComponents >= dim) 0.0
      else ev.drop(nComponents).sum / (dim - nComponents)
    Model(nComponents, whiten, mean,
      vecs.take(nComponents),
      ev.take(nComponents),
      ev.take(nComponents).map(v => if (total > 0) v / total else 0.0),
      ev.take(nComponents).map(v => math.sqrt(v * math.max(n - 1, 1))),
      noise, n)
  }

  private def projection(model: Model): ProjectionMatrix = {
    val k = model.nComponents
    val d = model.mean.length
    val flat = new Array[Double](k * d)
    for (i <- 0 until k; j <- 0 until d) {
      val scale = if (model.whiten && model.explainedVariance(i) > 0)
        1.0 / math.sqrt(model.explainedVariance(i)) else 1.0
      flat(i * d + j) = model.components(i)(j) * scale
    }
    ProjectionMatrix(flat, k, d, model.mean)
  }

  private def inverseProjection(model: Model): ProjectionMatrix = {
    val k = model.nComponents
    val d = model.mean.length
    // rows = d, cols = k: W^T (un-whitened), shifted by +mean
    val flat = new Array[Double](d * k)
    for (j <- 0 until d; i <- 0 until k) {
      val scale = if (model.whiten && model.explainedVariance(i) > 0)
        math.sqrt(model.explainedVariance(i)) else 1.0
      flat(j * k + i) = model.components(i)(j) * scale
    }
    ProjectionMatrix(flat, d, k, new Array[Double](k), shift = model.mean)
  }

  def transformCol(vec: Column, model: Model): Column =
    B.column(AffineProject(B.expression(vec), projection(model)))

  def inverseCol(vec: Column, model: Model): Column =
    B.column(AffineProject(B.expression(vec), inverseProjection(model)))

  def transform(df: DataFrame, model: Model, vecCol: String = "vec",
      outCol: String = "pc"): DataFrame =
    df.withColumn(outCol, transformCol(col(vecCol), model))

  def fitTransform(df: DataFrame, nComponents: Int, vecCol: String = "vec",
      whiten: Boolean = false): (Model, DataFrame) = {
    val m = fit(df, nComponents, vecCol, whiten)
    (m, transform(df, m, vecCol))
  }

  def inverseTransform(df: DataFrame, model: Model, pcCol: String = "pc",
      outCol: String = "vec_hat"): DataFrame =
    df.withColumn(outCol, inverseCol(col(pcCol), model))
}
