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

  private def strLit(fn: String)(e: Expression, what: String): String = {
    if (!e.foldable || e.dataType != StringType)
      throw new IllegalArgumentException(s"$fn: $what must be a string literal")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(s"$fn: $what must not be null")
    v.toString
  }

  /** k as a positive Int literal: a Long outside Int range must FAIL the
    * analysis, not wrap (4294967297 used to silently become k = 1), and
    * k < 1 is a contract error the user should see at plan time. */
  private def intLit(fn: String)(e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(s"$fn: k must be a literal")
    val k = e.eval() match {
      case i: Int => i
      case l: Long =>
        if (l < Int.MinValue || l > Int.MaxValue) throw new IllegalArgumentException(
          s"$fn: k $l out of Int range")
        l.toInt
      case other => throw new IllegalArgumentException(s"$fn: non-integer k $other")
    }
    if (k < 1) throw new IllegalArgumentException(s"$fn: k must be >= 1, got $k")
    k
  }

  /** Metric argument of the kNN TVFs: a known metric-enum name, or —
    * the reference's CustomUDF metric (distance.hpp:66) from pure SQL —
    * the name of a session-registered scalar function
    * `(array<float>, array<float>) -> double`, carried to the lowering
    * rule as `udf:<name>` (existence is checked there, where a session
    * is in hand; an unknown name fails the plan with a clear message). */
  private def metricLit(fn: String)(e: Expression): String = {
    val s = strLit(fn)(e, "metric")
    try Metric.fromName(s).name
    catch { case _: IllegalArgumentException => s"udf:$s" }
  }

  // real identifier parsing (backtick quoting, dotted parts) — a naive
  // split('.') would shred `cat.`a.b`.tbl` into four bogus parts
  private def rel(fn: String)(e: Expression, what: String) =
    org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseMultipartIdentifier(strLit(fn)(e, what)))

  val knnJoinTable: TableDescription = {
    val strLit = SqlFunctions.strLit("knn_join") _
    val intLit = SqlFunctions.intLit("knn_join") _
    val rel = SqlFunctions.rel("knn_join") _
    val metricLit = SqlFunctions.metricLit("knn_join") _
    (FunctionIdentifier("knn_join"),
      new ExpressionInfo(classOf[graft.plans.KnnJoinPlan].getName, null, "knn_join",
        "knn_join(data, queries, k, metric, id_col, vec_col, qid_col, qvec_col) - " +
          "declarative k-nearest-neighbor join between two named relations; " +
          "plans the same logical node as the Column API (index-aware lowering). " +
          "`metric` is a metric-enum name, or the name of a registered scalar " +
          "function (array<float>, array<float>) -> double used as a custom " +
          "distance (smaller = closer).", ""),
      (children: Seq[Expression]) => children match {
        case Seq(d, q, k, m, idc, vc, qidc, qvc) =>
          graft.plans.KnnJoinPlan(rel(d, "data"), rel(q, "queries"),
            intLit(k), metricLit(m),
            strLit(idc, "id_col"), strLit(vc, "vec_col"),
            strLit(qidc, "qid_col"), strLit(qvc, "qvec_col"))
        case _ => throw new IllegalArgumentException(
          s"knn_join expects 8 arguments, got ${children.length}")
      })
  }

  /** Filtered kNN join from pure SQL — the §2.8 filter surface
    * (bitset/deny-list filters, cagra.hpp sample_filter) as a TVF:
    *
    * {{{
    * SELECT * FROM knn_join_filtered('data_view', 'query_view',
    *   'filter_view', 'deny', 10, 'l2sqrt',
    *   'id', 'vec', 'qid', 'qvec'[, 'filter_id_col'])
    * }}}
    *
    * `mode` is 'deny' (rows whose id appears in the filter relation may
    * never be returned) or 'allow' (only listed ids may be returned).
    * The filter composes as a semi/anti JOIN on the data side UNDER the
    * same [[graft.plans.KnnJoinPlan]] node the unfiltered TVF plans — so
    * the lowering rule, route choice, and partial-top-k pipeline are
    * shared, and Catalyst plans the id filter as an ordinary broadcast
    * semi/anti join (the exact shape BruteForceKnn.knnJoinFiltered's
    * Column route builds). `filter_id_col` defaults to `id_col`. */
  val knnJoinFilteredTable: TableDescription = {
    val fn = "knn_join_filtered"
    val strLit = SqlFunctions.strLit(fn) _
    val intLit = SqlFunctions.intLit(fn) _
    val rel = SqlFunctions.rel(fn) _
    val metricLit = SqlFunctions.metricLit(fn) _
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, SubqueryAlias}
    def build(d: Expression, q: Expression, f: Expression, mode: Expression,
        k: Expression, m: Expression, idc: Expression, vc: Expression,
        qidc: Expression, qvc: Expression, fidc: Option[Expression]) = {
      val joinType = strLit(mode, "mode") match {
        case "deny" => LeftAnti
        case "allow" => LeftSemi
        case other => throw new IllegalArgumentException(
          s"$fn: mode must be 'deny' or 'allow', got '$other'")
      }
      val idName = strLit(idc, "id_col")
      val fidName = fidc.map(strLit(_, "filter_id_col")).getOrElse(idName)
      // alias both sides so the join key resolves unambiguously even when
      // the filter relation carries a column of the same name
      val dataAliased = SubqueryAlias("__graft_knn_data", rel(d, "data"))
      val filterAliased = SubqueryAlias("__graft_knn_filter", rel(f, "filter"))
      val filtered = Join(dataAliased, filterAliased, joinType,
        Some(EqualTo(
          UnresolvedAttribute(Seq("__graft_knn_data", idName)),
          UnresolvedAttribute(Seq("__graft_knn_filter", fidName)))),
        JoinHint.NONE)
      graft.plans.KnnJoinPlan(filtered, rel(q, "queries"),
        intLit(k), metricLit(m),
        idName, strLit(vc, "vec_col"),
        strLit(qidc, "qid_col"), strLit(qvc, "qvec_col"))
    }
    (FunctionIdentifier(fn),
      new ExpressionInfo(classOf[graft.plans.KnnJoinPlan].getName, null, fn,
        s"$fn(data, queries, filter, mode, k, metric, id_col, vec_col, " +
          "qid_col, qvec_col[, filter_id_col]) - kNN join where the filter " +
          "relation's ids are excluded (mode 'deny') or required (mode " +
          "'allow'); plans the same logical node as knn_join.", ""),
      (children: Seq[Expression]) => children match {
        case Seq(d, q, f, mode, k, m, idc, vc, qidc, qvc) =>
          build(d, q, f, mode, k, m, idc, vc, qidc, qvc, None)
        case Seq(d, q, f, mode, k, m, idc, vc, qidc, qvc, fidc) =>
          build(d, q, f, mode, k, m, idc, vc, qidc, qvc, Some(fidc))
        case _ => throw new IllegalArgumentException(
          s"$fn expects 10 or 11 arguments, got ${children.length}")
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
    Seq(knnJoinTable, knnJoinFilteredTable).foreach { case (id, i, b) =>
      treg.registerFunction(id, i, b)
    }
    graft.plans.ResolveKnnJoin.ensureInstalled(spark)
  }
}
