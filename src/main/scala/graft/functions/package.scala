package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{bridge => ExpressionUtils}
import graft.core.Metric
import graft.expr.VectorDistance

/** Column-level entry points for the engine's scalar surface. */
package object functions {

  /** Distance between two array<float> columns under `metric` — a native
    * codegen expression (not a UDF). */
  def vector_distance(metric: Metric, a: Column, b: Column, metricArg: Double = 2.0): Column =
    ExpressionUtils.column(VectorDistance(metric.name,
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), metricArg))

  def l2_distance(a: Column, b: Column): Column = vector_distance(Metric.L2Sqrt, a, b)
  def l2_squared(a: Column, b: Column): Column = vector_distance(Metric.L2, a, b)
  def inner_product(a: Column, b: Column): Column = vector_distance(Metric.InnerProduct, a, b)
  def cosine_distance(a: Column, b: Column): Column = vector_distance(Metric.Cosine, a, b)
}
