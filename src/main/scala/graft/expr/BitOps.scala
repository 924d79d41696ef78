package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Per-dimension thresholds for 1-bit quantization, packed LSB-first into
  * 32-bit words inside BIGINTs (32, not 64, so a SQL oracle can rebuild the
  * same codes without hitting DuckDB's `1<<63` signed-shift overflow). */
case class BitThresholds(thresholds: Array[Double]) extends Serializable {
  def dim: Int = thresholds.length
  def words: Int = (dim + 31) / 32
}

object BitPackOps {
  final val WORD_BITS = 32

  /** vec (array<float>) -> array<bigint> of packed sign bits (x > threshold). */
  def pack(t: BitThresholds, vec: ArrayData): ArrayData = {
    val out = new Array[Long](t.words)
    var i = 0
    while (i < t.dim) {
      if (vec.getFloat(i).toDouble > t.thresholds(i))
        out(i / WORD_BITS) |= (1L << (i % WORD_BITS))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** popcount(xor) over two packed code arrays — BitwiseHamming
    * (distance.hpp:61-62) on the packed layout. */
  def hamming(a: ArrayData, b: ArrayData): Int = {
    var c = 0; var i = 0
    val n = a.numElements()
    while (i < n) { c += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    c
  }
}

/** `binary_quantize(vec)` -> array<bigint> — 1 bit/dim against per-dim
  * thresholds (quantize/binary.hpp:31-56; threshold ∈ {zero, mean, median}
  * is baked into the BitThresholds at train time). Map-side only. */
case class BinaryQuantize(child: Expression, thresholds: BitThresholds)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    BitPackOps.pack(thresholds, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bitThresholds", thresholds, classOf[BitThresholds].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.expr.BitPackOps.pack($ref, $v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `hamming_packed(a, b)` -> int — popcount(xor) over packed bit codes. */
case class HammingPacked(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<bigint> pair, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    BitPackOps.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.expr.BitPackOps.hamming($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
