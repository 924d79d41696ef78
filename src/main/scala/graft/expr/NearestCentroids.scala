package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import graft.core.Metric

/** A trained centroid set (k x dim, row-major flat) carried into tasks as a
  * codegen reference object — the broadcast-centroids side of the
  * reference's coarse search (ivf_flat_search.cuh:41-188: query x centroid
  * GEMM + select_k of n_probes cells; here: one fused scan per row).
  */
case class CentroidSet(flat: Array[Float], k: Int, dim: Int, metricName: String)
    extends Serializable {
  @transient lazy val metricId: Int = VectorDistanceOps.id(Metric.fromName(metricName))
  @transient lazy val minClose: Boolean = Metric.isMinClose(Metric.fromName(metricName))

  def centroid(c: Int): Array[Float] = {
    val out = new Array[Float](dim)
    System.arraycopy(flat, c * dim, out, 0, dim)
    out
  }
  def centroids: Array[Array[Float]] = Array.tabulate(k)(centroid)
}

object CentroidOps {
  /** Top-p nearest centroids of `vec`, best first, (list_id, dist) pairs —
    * full scan over k centroids, insertion-select into a size-p buffer.
    * p is tiny (1..~32) so insertion sort beats a heap. */
  def nearest(cs: CentroidSet, vec: ArrayData, p: Int): ArrayData = {
    val dim = cs.dim
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) { v(i) = vec.getFloat(i); i += 1 }
    val n = math.min(p, cs.k)
    val bestId = new Array[Int](n)
    val bestD = new Array[Double](n)
    var size = 0
    val sign = if (cs.minClose) 1.0 else -1.0
    var c = 0
    while (c < cs.k) {
      val d = sign * distTo(cs, v, c)
      if (size < n || d < bestD(size - 1)) {
        var pos = if (size < n) size else n - 1
        while (pos > 0 && bestD(pos - 1) > d) {
          bestD(pos) = bestD(pos - 1); bestId(pos) = bestId(pos - 1); pos -= 1
        }
        bestD(pos) = d; bestId(pos) = c
        if (size < n) size += 1
      }
      c += 1
    }
    val rows = new Array[Any](size)
    i = 0
    while (i < size) {
      rows(i) = new GenericInternalRow(Array[Any](bestId(i), sign * bestD(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  def residual(cs: CentroidSet, vec: ArrayData, listId: Int): ArrayData = {
    val off = listId * cs.dim
    val out = new Array[Float](cs.dim)
    var i = 0
    while (i < cs.dim) { out(i) = vec.getFloat(i) - cs.flat(off + i); i += 1 }
    new GenericArrayData(out)
  }

  private def distTo(cs: CentroidSet, v: Array[Float], c: Int): Double = {
    val off = c * cs.dim
    cs.metricId match {
      case VectorDistanceOps.L2 | VectorDistanceOps.L2SQRT =>
        var s = 0.0; var i = 0
        while (i < cs.dim) { val d = v(i).toDouble - cs.flat(off + i); s += d * d; i += 1 }
        if (cs.metricId == VectorDistanceOps.L2SQRT) math.sqrt(s) else s
      case VectorDistanceOps.IP =>
        var s = 0.0; var i = 0
        while (i < cs.dim) { s += v(i).toDouble * cs.flat(off + i); i += 1 }
        s
      case VectorDistanceOps.COSINE =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < cs.dim) {
          val x = v(i).toDouble; val y = cs.flat(off + i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
      case mid =>
        graft.core.Distance.fn(graft.core.Metric.all.find(m =>
          VectorDistanceOps.id(m) == mid).get)(v, cs.centroid(c))
    }
  }
}

/** `vec - centroid[list_id]` — the residual an IVF-PQ list entry encodes
  * (ivf_pq build encodes residuals against the cell center). */
case class CentroidResidual(left: Expression, right: Expression, centroids: CentroidSet)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(v: Any, listId: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val off = listId.asInstanceOf[Int] * centroids.dim
    val out = new Array[Float](centroids.dim)
    var i = 0
    while (i < centroids.dim) { out(i) = vec.getFloat(i) - centroids.flat(off + i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidSet", centroids, classOf[CentroidSet].getName)
    nullSafeCodeGen(ctx, ev, (v, l) =>
      s"${ev.value} = graft.expr.CentroidOps.residual($ref, $v, $l);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `centroid[list_id]` — the center lookup itself (the inverse of
  * CentroidResidual; used by reconstruction paths like VQ+PQ inverse). */
case class CentroidVector(child: Expression, centroids: CentroidSet)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(listId: Any): Any = {
    val off = listId.asInstanceOf[Int] * centroids.dim
    val out = new Array[Float](centroids.dim)
    System.arraycopy(centroids.flat, off, out, 0, centroids.dim)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidSet", centroids, classOf[CentroidSet].getName)
    val tmp = ctx.freshName("cv")
    nullSafeCodeGen(ctx, ev, l =>
      s"""float[] $tmp = new float[$ref.dim()];
         |System.arraycopy($ref.flat(), $l * $ref.dim(), $tmp, 0, $ref.dim());
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `nearest_centroids(vec)` -> array<struct<list_id int, dist double>> of the
  * top-p closest centroids, best first. Pure map-side: no join, no shuffle —
  * the assignment step of k-means (kmeans.hpp predict) and the probe
  * selection of IVF search (ivf_flat_search.cuh:180-188) in one expression.
  */
case class NearestCentroids(child: Expression, centroids: CentroidSet, p: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("list_id", IntegerType, nullable = false),
      StructField("dist", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    CentroidOps.nearest(centroids, v.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidSet", centroids, classOf[CentroidSet].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.CentroidOps.nearest($ref, $v, $p);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
