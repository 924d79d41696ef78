package graft.core

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable (sum, count) buffer for element-wise vector mean. */
case class VecSumBuf(var sum: Array[Double], var n: Long)

/** Fused element-wise mean over an array<float> column — the centroid-update
  * aggregation of Lloyd's k-means (kmeans.hpp fit), as a single typed
  * aggregator instead of posexplode + pivot (one partial buffer per
  * (group, partition) crosses the shuffle; map-side combine is automatic).
  */
class VectorAvgAgg extends Aggregator[Array[Float], VecSumBuf, Array[Float]] {
  override def zero: VecSumBuf = VecSumBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecSumBuf, v: Array[Float]): VecSumBuf = {
    if (b.sum.length == 0) b.sum = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { b.sum(i) += v(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf = {
    if (a.sum.length == 0) b
    else if (b.sum.length == 0) a
    else {
      var i = 0
      while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
      a.n += b.n
      a
    }
  }

  override def finish(b: VecSumBuf): Array[Float] =
    if (b.n == 0) Array.emptyFloatArray
    else b.sum.map(s => (s / b.n).toFloat)

  override def bufferEncoder: Encoder[VecSumBuf] = ExpressionEncoder[VecSumBuf]()
  override def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
}

object VectorAgg {
  def vectorAvg(vec: Column): Column =
    udaf(new VectorAvgAgg, ExpressionEncoder[Array[Float]]()).apply(vec)
}
