package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.StringType
import graft.core.Metric
import graft.expr.VectorDistance

/** SQL surface for the scalar distance expressions: the same codegen
  * `VectorDistance` the Column API plans, registered by NAME into the
  * session's function registry so `spark.sql("SELECT l2_distance(a, b)…")`
  * and pure-SQL users (thriftserver, notebooks) get the native expression
  * — never a UDF. The reference's analog is the metric enum every search
  * API accepts (distance.hpp:66); here the enum is a function name or the
  * first argument of `vector_distance('<metric>', a, b[, p])`.
  *
  * Install per session with [[register]] (idempotent — re-registering
  * replaces the same builders), or for every session at startup via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
object SqlFunctions {

  type Builder = Seq[Expression] => Expression
  type Description = (FunctionIdentifier, ExpressionInfo, Builder)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[VectorDistance].getName, null, name, usage, "")

  private def fixed(name: String, metric: Metric): Description =
    (FunctionIdentifier(name), info(name, s"$name(a, b) - ${metric.name} distance " +
      "between two array<float> columns (native codegen expression)."),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => VectorDistance(metric.name, a, b)
        case _ => throw new IllegalArgumentException(
          s"$name expects exactly 2 arguments, got ${children.length}")
      })

  /** `vector_distance('<metric>', a, b[, p])` — metric name must be a
    * foldable string (it selects the expression at plan time, exactly like
    * the reference's compile-time metric dispatch). */
  private val generic: Description =
    (FunctionIdentifier("vector_distance"),
      info("vector_distance", "vector_distance(metric, a, b[, p]) - distance between two " +
        "array<float> columns under the named metric ('l2', 'l2sqrt', 'cosine', " +
        "'ip', 'l1', 'lp', ...); p is the Minkowski exponent for 'lp'."),
      (children: Seq[Expression]) => {
        def metricName(e: Expression): String = {
          if (!e.foldable || e.dataType != StringType)
            throw new IllegalArgumentException(
              "vector_distance: the metric must be a string literal")
          val v = e.eval()
          if (v == null) throw new IllegalArgumentException(
            "vector_distance: the metric must not be null")
          Metric.fromName(v.toString).name
        }
        def arg(e: Expression): Double = {
          if (!e.foldable) throw new IllegalArgumentException(
            "vector_distance: the metric exponent must be a literal")
          v2d(e.eval())
        }
        children match {
          case Seq(m, a, b) => VectorDistance(metricName(m), a, b)
          case Seq(m, a, b, p) => VectorDistance(metricName(m), a, b, arg(p))
          case _ => throw new IllegalArgumentException(
            s"vector_distance expects 3 or 4 arguments, got ${children.length}")
        }
      })

  private def v2d(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble // SQL `3.0` literal
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"vector_distance: non-numeric metric exponent $other")
  }

  /** Every SQL-registered function, in `GraftExtensions.injectFunction`
    * form. */
  val descriptions: Seq[Description] = Seq(
    generic,
    fixed("l2_distance", Metric.L2Sqrt),
    fixed("l2_squared", Metric.L2),
    fixed("cosine_distance", Metric.Cosine),
    fixed("inner_product", Metric.InnerProduct),
    fixed("l1_distance", Metric.L1),
  )

  /** Register into `spark`'s live function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = org.apache.spark.sql.graft.bridge.functionRegistry(spark)
    descriptions.foreach { case (id, i, b) => reg.registerFunction(id, i, b) }
  }
}
