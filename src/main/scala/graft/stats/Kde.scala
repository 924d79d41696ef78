package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.functions.vector_distance

/** Kernel density estimation — `cuvs::distance::kde` (kde.hpp:19-48):
  * log-density of each query vs the training set under one of six kernels
  * (DensityKernelType, distance.hpp:93-100).
  *
  * Relational shape (SURVEY.md §2.2): query x data join (broadcast the
  * query side) -> kernel weight per pair -> sum per query -> log. Compact
  * kernels (tophat/epanechnikov/linear/cosine) zero out beyond h, so at
  * scale they compose with the eps range join to prune pairs first.
  */
object Kde {

  sealed abstract class Kernel(val name: String)
  case object Gaussian extends Kernel("gaussian")
  case object Tophat extends Kernel("tophat")
  case object Epanechnikov extends Kernel("epanechnikov")
  case object Exponential extends Kernel("exponential")
  case object Linear extends Kernel("linear")
  case object CosineK extends Kernel("cosine")

  /** Unnormalized kernel weight as a function of distance d and bandwidth h
    * (matching the scipy-golden discipline of the reference tests,
    * kde.cu:36-59: densities compare unnormalized, log at the end). */
  def weight(kernel: Kernel, d: Column, h: Double): Column = kernel match {
    case Gaussian => exp(d * d * (-1.0 / (2.0 * h * h)))
    case Tophat => when(d < h, lit(1.0)).otherwise(0.0)
    case Epanechnikov => when(d < h, lit(1.0) - (d * d) / (h * h)).otherwise(0.0)
    case Exponential => exp(-d / h)
    case Linear => when(d < h, lit(1.0) - d / h).otherwise(0.0)
    case CosineK => when(d < h, cos(d * (math.Pi / 2 / h))).otherwise(0.0)
  }

  /** (qid, log_density) for each query row. */
  def logDensity(queries: DataFrame, data: DataFrame, bandwidth: Double,
      kernel: Kernel = Gaussian, metric: Metric = Metric.L2Sqrt,
      qidCol: String = "qid", qvecCol: String = "qvec", vecCol: String = "vec"): DataFrame = {
    val q = queries.select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("_qvec"))
    val d = data.select(col(vecCol).as("_dvec"))
    d.crossJoin(broadcast(q))
      .select(col("qid"),
        weight(kernel, vector_distance(metric, col("_qvec"), col("_dvec")), bandwidth).as("w"))
      .groupBy(col("qid"))
      .agg(log(sum(col("w"))).as("log_density"))
  }
}
