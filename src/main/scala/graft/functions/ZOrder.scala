package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Morton (Z-order) interleaving — the clustering key behind
 * [[graft.operators.ZOrderLayout]]: sorting by the interleaved bits of two
 * dimensions keeps BOTH dimensions locally dense, so per-file/row-group
 * min-max stats stay tight on each column and scans filtered on EITHER
 * dimension skip most of the data (a linear sort only ever serves its
 * leading column).
 */
object ZOrderImpl {
  /** Spread the low 32 bits of x into the even bit positions of a long. */
  @inline private def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /**
   * 64-bit Morton code of the low 32 bits of each input, sign-flipped so
   * SIGNED long ordering == unsigned Z-curve ordering (Spark sorts longs
   * signed). Inputs outside [0, 2³²) wrap by masking — use id/date/bucket
   * dimensions that fit 32 bits, or pre-shift.
   */
  def interleave(a: Long, b: Long): Long =
    (spread(a) | (spread(b) << 1)) ^ java.lang.Long.MIN_VALUE

  /**
   * 64-bit Hilbert index of the low 32 bits of each input (the classic
   * iterative xy→d walk with per-quadrant reflection+swap), sign-flipped
   * like [[interleave]] so signed long ordering == curve ordering.
   *
   * Versus Morton: the Hilbert curve is CONTINUOUS — consecutive indexes
   * are spatially adjacent cells, so any contiguous index range (a file, a
   * row group) covers one connected blob with no diagonal jumps, where the
   * Z-curve teleports across the plane at quadrant boundaries and a file
   * straddling such a seam spans a huge bounding box. Tighter boxes ⇒
   * tighter per-file min/max stats ⇒ more files pruned (measured against
   * Morton in ZOrderSpec). Cost: ~4 ops per bit level instead of ~1 — paid
   * once at layout time, never at read time.
   *
   * Intermediate x/y go negative after reflection; that is fine because
   * `(x & s)` on a two's-complement long still extracts the single bit s
   * exactly as the algorithm needs (same semantics the reference
   * formulation relies on).
   */
  def hilbert(a: Long, b: Long): Long = {
    var x = a & 0xffffffffL
    var y = b & 0xffffffffL
    var d = 0L
    var s = 1L << 31
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d ^ java.lang.Long.MIN_VALUE
  }
}

case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zvalue requires BIGINT inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderImpl.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hvalue requires BIGINT inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hvalue"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.hilbert(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderImpl.hilbert($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {
  /** Morton code of two BIGINT dimensions (signed-order-correct). */
  def zvalue(a: Column, b: Column): Column =
    Shims.column(InterleaveBits(Shims.expression(a), Shims.expression(b)))

  /** Hilbert index of two BIGINT dimensions (signed-order-correct). */
  def hvalue(a: Column, b: Column): Column =
    Shims.column(HilbertIndex(Shims.expression(a), Shims.expression(b)))
}
