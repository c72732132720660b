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

object ZOrderFunctions {
  /** Morton code of two BIGINT dimensions (signed-order-correct). */
  def zvalue(a: Column, b: Column): Column =
    Shims.column(InterleaveBits(Shims.expression(a), Shims.expression(b)))
}
