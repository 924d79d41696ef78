package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.functions.vector_distance

/** Kernel Gram matrices — `cuvs::distance::kernels`
  * (grammian.hpp:114-146; KernelParams distance.hpp:113-119):
  * LINEAR / POLYNOMIAL / RBF / TANH over vector pairs, as the pairwise
  * join with a kernel epilogue on the inner product / distance.
  */
object Kernels {

  sealed trait Kernel
  case object Linear extends Kernel
  /** (gamma * <a,b> + coef0)^degree */
  case class Polynomial(degree: Int = 3, gamma: Double = 1.0, coef0: Double = 0.0) extends Kernel
  /** exp(-gamma * |a-b|^2) */
  case class Rbf(gamma: Double = 1.0) extends Kernel
  /** tanh(gamma * <a,b> + coef0) */
  case class Tanh(gamma: Double = 1.0, coef0: Double = 0.0) extends Kernel

  def kernelCol(kernel: Kernel, a: Column, b: Column): Column = kernel match {
    case Linear => vector_distance(Metric.InnerProduct, a, b)
    case Polynomial(d, g, c) => pow(vector_distance(Metric.InnerProduct, a, b) * g + c, d)
    case Rbf(g) => exp(vector_distance(Metric.L2, a, b) * -g)
    case Tanh(g, c) => tanh(vector_distance(Metric.InnerProduct, a, b) * g + c)
  }

  /** Gram edge list (aid, bid, k) — dense matrix relationalized, same
    * blocked-broadcast shape as PairwiseDistance. */
  def gram(a: DataFrame, b: DataFrame, kernel: Kernel,
      aIdCol: String = "id", aVecCol: String = "vec",
      bIdCol: String = "id", bVecCol: String = "vec"): DataFrame = {
    val l = a.select(col(aIdCol).cast("long").as("aid"), col(aVecCol).as("_avec"))
    val r = b.select(col(bIdCol).cast("long").as("bid"), col(bVecCol).as("_bvec"))
    l.crossJoin(broadcast(r))
      .select(col("aid"), col("bid"), kernelCol(kernel, col("_avec"), col("_bvec")).as("k"))
  }
}
