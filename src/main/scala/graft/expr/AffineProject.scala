package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** y = M (x - center) + shift, with M (rows x cols) flattened row-major —
  * the broadcast matrix-multiply of PCA transform / inverse_transform
  * (pca.hpp:157/:178). */
case class ProjectionMatrix(flat: Array[Double], rows: Int, cols: Int,
    center: Array[Double], shift: Array[Double] = Array.emptyDoubleArray)
    extends Serializable

object AffineOps {
  def apply(p: ProjectionMatrix, x: ArrayData): ArrayData = {
    val in = new Array[Double](p.cols)
    var j = 0
    while (j < p.cols) {
      in(j) = x.getFloat(j).toDouble - (if (p.center.length > 0) p.center(j) else 0.0)
      j += 1
    }
    val out = new Array[Float](p.rows)
    var i = 0
    while (i < p.rows) {
      var s = if (p.shift.length > 0) p.shift(i) else 0.0
      val off = i * p.cols
      j = 0
      while (j < p.cols) { s += p.flat(off + j) * in(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class AffineProject(child: Expression, proj: ProjectionMatrix)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $o")
  }

  override def nullSafeEval(v: Any): Any =
    AffineOps(proj, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("projection", proj, classOf[ProjectionMatrix].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.expr.AffineOps.apply($ref, $v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
