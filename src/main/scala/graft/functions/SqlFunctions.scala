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

  /** SQL surface for the FLAGSHIP operator: `knn_join` as a table-valued
    * function, planning the declarative [[graft.plans.KnnJoinPlan]] node —
    * the same logical node the Column API builds, so the optimizer's route
    * choice (registered index vs brute partial-top-k) applies to pure-SQL
    * users identically. Relations are named (temp views / catalog tables):
    *
    * {{{
    * SELECT * FROM knn_join('data_view', 'query_view', 10, 'l2sqrt',
    *                        'id', 'vec', 'qid', 'qvec')
    * }}}
    *
    * All eight arguments must be literals (the relation names resolve
    * through the analyzer as multipart identifiers). Output is the node's
    * fixed schema (qid, nbr_id, rank, dist). Requires the
    * [[graft.plans.ResolveKnnJoin]] rule (installed by GraftExtensions, or
    * per session via experimental.extraOptimizations) to lower the node. */
  type TableBuilder = Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  type TableDescription = (FunctionIdentifier, ExpressionInfo, TableBuilder)

  val knnJoinTable: TableDescription = {
    def strLit(e: Expression, what: String): String = {
      if (!e.foldable || e.dataType != StringType)
        throw new IllegalArgumentException(s"knn_join: $what must be a string literal")
      val v = e.eval()
      if (v == null) throw new IllegalArgumentException(s"knn_join: $what must not be null")
      v.toString
    }
    def intLit(e: Expression): Int = {
      if (!e.foldable) throw new IllegalArgumentException("knn_join: k must be a literal")
      e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"knn_join: non-integer k $other")
      }
    }
    // real identifier parsing (backtick quoting, dotted parts) — a naive
    // split('.') would shred `cat.`a.b`.tbl` into four bogus parts
    def rel(e: Expression, what: String) =
      org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseMultipartIdentifier(strLit(e, what)))
    (FunctionIdentifier("knn_join"),
      new ExpressionInfo(classOf[graft.plans.KnnJoinPlan].getName, null, "knn_join",
        "knn_join(data, queries, k, metric, id_col, vec_col, qid_col, qvec_col) - " +
          "declarative k-nearest-neighbor join between two named relations; " +
          "plans the same logical node as the Column API (index-aware lowering).", ""),
      (children: Seq[Expression]) => children match {
        case Seq(d, q, k, m, idc, vc, qidc, qvc) =>
          graft.plans.KnnJoinPlan(rel(d, "data"), rel(q, "queries"),
            intLit(k), Metric.fromName(strLit(m, "metric")).name,
            strLit(idc, "id_col"), strLit(vc, "vec_col"),
            strLit(qidc, "qid_col"), strLit(qvc, "qvec_col"))
        case _ => throw new IllegalArgumentException(
          s"knn_join expects 8 arguments, got ${children.length}")
      })
  }

  /** Register into `spark`'s live function registries (idempotent). Also
    * installs the ResolveKnnJoin lowering rule: the knn_join TVF plans a
    * KnnJoinPlan node, and registering the name without its lowering
    * would hand pure-SQL users an opaque "No plan for KnnJoinPlan" crash
    * at execution. */
  def register(spark: SparkSession): Unit = {
    val reg = org.apache.spark.sql.graft.bridge.functionRegistry(spark)
    descriptions.foreach { case (id, i, b) => reg.registerFunction(id, i, b) }
    val treg = org.apache.spark.sql.graft.bridge.tableFunctionRegistry(spark)
    treg.registerFunction(knnJoinTable._1, knnJoinTable._2, knnJoinTable._3)
    graft.plans.ResolveKnnJoin.ensureInstalled(spark)
  }
}
