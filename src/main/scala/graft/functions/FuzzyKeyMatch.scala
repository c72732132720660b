package graft.functions

import scala.collection.immutable.ArraySeq

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/**
 * HBase FuzzyRowFilter predicate (the fixed-position row-key wildcard match):
 * `mask(i) == 0` means byte `i` of the key must equal `pattern(i)`; any other
 * mask byte is a wildcard. A key shorter than the pattern never matches
 * (every fixed position must exist to be compared).
 *
 * The pattern/mask pair parameterizes the expression (codegen reference
 * objects), it is not per-row data — mirroring how the HBase filter is
 * constructed once per scan with `Pair<byte[] fuzzyKey, byte[] mask>`. The
 * pair is carried as `ArraySeq[Byte]`, not `Array[Byte]`: case-class
 * equality on raw arrays is reference-based, which would break Catalyst
 * semanticEquals/canonicalization (duplicate fuzzy predicates could not be
 * deduplicated or simplified); the companion `apply` accepts arrays.
 * Reference semantics: symat-hbase-tools drives full scans with server-side
 * `Filter`s (`CorruptRowsMR.java` scan setup); this is the Spark-native form
 * of the one HBase filter whose power is key-shape matching rather than a
 * contiguous range. Range pruning for the fixed *prefix* of the mask is
 * derived separately in [[graft.operators.FuzzyScan]] so this expression is
 * only ever a residual re-check on scanned rows.
 */
case class FuzzyKeyMatch(child: Expression, pattern: ArraySeq[Byte], mask: ArraySeq[Byte])
    extends UnaryExpression {
  require(pattern.length == mask.length,
    s"fuzzy pattern (${pattern.length} bytes) and mask (${mask.length} bytes) must align")

  @transient private lazy val patternArr: Array[Byte] = pattern.toArray
  @transient private lazy val maskArr: Array[Byte] = mask.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fuzzy_key_match requires BINARY input, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "fuzzy_key_match"

  override def nullSafeEval(input: Any): Any =
    FuzzyKeyMatch.matches(input.asInstanceOf[Array[Byte]], patternArr, maskArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pat = ctx.addReferenceObj("fuzzyPattern", patternArr, "byte[]")
    val msk = ctx.addReferenceObj("fuzzyMask", maskArr, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FuzzyKeyMatch.matches($c, $pat, $msk)")
  }

  override protected def withNewChildInternal(newChild: Expression): FuzzyKeyMatch =
    copy(child = newChild)
}

object FuzzyKeyMatch {
  /** Array-taking constructor (the natural call-site type). */
  def apply(child: Expression, pattern: Array[Byte], mask: Array[Byte]): FuzzyKeyMatch =
    FuzzyKeyMatch(child,
      ArraySeq.unsafeWrapArray(pattern), ArraySeq.unsafeWrapArray(mask))

  /** Shared by interpreted eval and generated code. */
  def matches(key: Array[Byte], pattern: Array[Byte], mask: Array[Byte]): Boolean = {
    if (key.length < pattern.length) return false
    var i = 0
    while (i < pattern.length) {
      if (mask(i) == 0 && key(i) != pattern(i)) return false
      i += 1
    }
    true
  }
}
