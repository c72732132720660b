package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * fastText-style hashed-linear text scorer: each space-delimited token
 * hashes (fnv1a64) into one of `dim` feature buckets, every bucket
 * carries a fixed weight, and the document's margin is the left-fold sum
 * of its tokens' weights in document order. Decide keep/drop with
 * `margin > θ` — no sigmoid needed (it is monotone in the margin), and
 * no transcendental call means the score replays bit-for-bit in any
 * engine.
 *
 * Weights here are the deterministic splitmix64 stub
 * `mix64(bucket) / 2^63 ∈ (-1, 1)` — the classifier HARNESS (hashing,
 * bucketing, ordered margin fold, one codegen'd pass per row, zero
 * shuffle) is the deliverable, exactly like the multimodal stub codecs:
 * swapping trained fastText weights in means replacing one pure function
 * of the bucket index, nothing in the plan changes.
 */
object HashedLinearImpl {
  private val Inv2p63 = 9.223372036854775807e18 // Long.MaxValue as double = 2^63

  def weight(bucket: Long): Double =
    MinHashImpl.mix64(bucket).toDouble / Inv2p63

  def margin(text: UTF8String, dim: Int): Double = {
    val tokens = text.toString.split(" ", -1)
    var m = 0.0
    var i = 0
    while (i < tokens.length) {
      val h = SimHashImpl.fnv1a64(
        tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      m += weight(java.lang.Math.floorMod(h, dim.toLong))
      i += 1
    }
    m
  }
}

case class HashedLinearMargin(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 2, "feature dimension must be >= 2")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hlc_margin requires STRING input, got ${t.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hlc_margin"

  override def nullSafeEval(input: Any): Any =
    HashedLinearImpl.margin(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedLinearImpl.margin($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedLinearMargin =
    copy(child = newChild)
}

object HashedLinearFunctions {
  /** Hashed-linear classifier margin of `text` over `dim` buckets. */
  def hlc_margin(text: Column, dim: Int): Column =
    Shims.column(HashedLinearMargin(Shims.expression(text), dim))
}
