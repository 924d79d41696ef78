package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization — `cuvs::preprocessing::quantize::scalar`
  * (scalar.hpp:30-41 params with quantile=0.99, :48-53 quantizer{min_,max_},
  * :71 train, :114 transform, :165 inverse_transform).
  *
  * train = one exact-percentile aggregation over the exploded elements
  * (quantile-clipped global [lo, hi]); transform/inverse are pure map-side
  * column expressions (codegen'd `transform` lambdas, no UDF). Spark's
  * `percentile` and DuckDB's `quantile_cont` interpolate identically, so
  * the oracle compare is exact.
  */
object ScalarQuantizer {

  case class Model(lo: Double, hi: Double) {
    def scale: Double = 255.0 / (hi - lo)
  }

  /** Quantile-clipped global min/max: lo = pct((1-q)/2), hi = pct(1-(1-q)/2). */
  def train(df: DataFrame, vecCol: String = "vec", quantile: Double = 0.99): Model = {
    val tail = (1.0 - quantile) / 2.0
    val r = df.select(explode(col(vecCol)).as("x"))
      .agg(percentile(col("x").cast("double"), lit(tail)).as("lo"),
        percentile(col("x").cast("double"), lit(1.0 - tail)).as("hi"))
      .head()
    Model(r.getDouble(0), r.getDouble(1))
  }

  /** Element-wise int8 code: clamp(round((x-lo)/(hi-lo)*255) - 128). */
  def transformCol(vec: Column, m: Model): Column =
    org.apache.spark.sql.functions.transform(vec, x =>
      greatest(lit(-128), least(lit(127),
        round((x.cast("double") - m.lo) * m.scale) - 128)).cast("byte"))

  /** Inverse map back to float: (q+128)/255*(hi-lo)+lo (midpoint-free,
    * matching the reference's linear inverse). */
  def inverseCol(codes: Column, m: Model): Column =
    org.apache.spark.sql.functions.transform(codes, q =>
      ((q.cast("double") + 128) / 255.0 * (m.hi - m.lo) + m.lo).cast("float"))

  def transform(df: DataFrame, m: Model, vecCol: String = "vec",
      outCol: String = "codes"): DataFrame =
    df.withColumn(outCol, transformCol(col(vecCol), m))

  def inverseTransform(df: DataFrame, m: Model, codesCol: String = "codes",
      outCol: String = "vec_hat"): DataFrame =
    df.withColumn(outCol, inverseCol(col(codesCol), m))
}
