package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Scalar kernels for the RaBitQ distance estimator
  * (`cuvs::neighbors::ivf_rabitq`, ivf_rabitq.hpp:37-110: binary RaBitQ
  * code + optional extended bits per dimension).
  *
  * A data residual r is rotated (u = P r, a seeded orthogonal P — the
  * random rotation the algorithm's estimator guarantees rely on) and
  * 1-bit-quantized to its sign pattern x̄ = sign(u)/√D. With
  * S1 = Σ_{bit i set} qr[i] and S = Σ qr[i], the inner-product estimate
  * against a rotated query residual qr simplifies to
  *   <r, q-c> ≈ ‖u‖² (2·S1 − S) / Σ|u_i|,
  * so per row only (packed sign bits, ‖u‖², Σ|u|) are stored and the
  * whole estimator is one popcount-driven gather plus codegen'd column
  * arithmetic. Extended bits refine |u_i| with a (b−1)-bit magnitude code
  * (RabitqDotEx) — smaller estimator variance, same plumbing.
  */
object RabitqOps {
  final val WORD_BITS = 32 // matches BitPackOps packing (oracle-replayable)

  /** Σ of qr entries at set-bit positions of the packed sign code. */
  def dotSelected(code: ArrayData, qr: ArrayData): Double = {
    var s = 0.0
    var w = 0
    val words = code.numElements()
    while (w < words) {
      var bits = code.getLong(w)
      val base = w * WORD_BITS
      while (bits != 0) {
        val i = java.lang.Long.numberOfTrailingZeros(bits)
        s += qr.getFloat(base + i).toDouble
        bits &= bits - 1
      }
      w += 1
    }
    s
  }

  /** <û, qr> with û_i = sign_i · (mag_i + 0.5) · scale — the extended-bits
    * decode fused into the dot product (never materialized). */
  def dotExtended(code: ArrayData, mags: ArrayData, scale: Double, qr: ArrayData): Double = {
    var s = 0.0
    val n = mags.numElements()
    var i = 0
    while (i < n) {
      val sign = if ((code.getLong(i / WORD_BITS) >>> (i % WORD_BITS) & 1L) != 0L) 1.0 else -1.0
      s += sign * (mags.getByte(i).toDouble + 0.5) * scale * qr.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

/** `rabitq_dot(code, qr)` -> double: Σ qr[i] over set sign bits. */
case class RabitqDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected (array<bigint>, array<float>), got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    RabitqOps.dotSelected(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.expr.RabitqOps.dotSelected($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `rabitq_dot_ex(code, mags, scale, qr)` -> double: extended-bits ADC. */
case class RabitqDotEx(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = children.map(_.dataType) match {
    case Seq(ArrayType(LongType, _), ArrayType(ByteType, _), DoubleType, ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected (array<bigint>, array<tinyint>, double, array<float>), got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else RabitqOps.dotExtended(vs(0).asInstanceOf[ArrayData], vs(1).asInstanceOf[ArrayData],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(_.isNull.code).mkString(" || ")
    val childCode = evs.map(_.code).reduce(_ + _)
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = graft.expr.RabitqOps.dotExtended(
            ${evs(0).value}, ${evs(1).value}, ${evs(2).value}, ${evs(3).value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
