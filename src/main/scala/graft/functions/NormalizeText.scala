package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode text normalization for corpus cleaning, one codegen'd pass:
 *
 *  1. Unicode NFC composition (`java.text.Normalizer` — e+combining-acute
 *     and precomposed é hash/compare equal afterwards; dedup and shingle
 *     hashes otherwise treat them as different text);
 *  2. control characters (C0 except the whitespace ones, DEL, C1)
 *     dropped — the classic crawl-garbage bytes;
 *  3. whitespace runs — an EXPLICITLY ENUMERATED class (ASCII ws, NBSP,
 *     OGHAM, the U+2000 block, LINE/PARA SEP, NNBSP, MMSP, IDEOGRAPHIC
 *     SPACE), not `Character.isWhitespace`, so the oracle regex can name
 *     the identical set — collapsed to one ASCII space, ends trimmed.
 *
 * The oracle twin is DuckDB `nfc_normalize` + two regexes over the same
 * enumerated classes; NFC itself is engine-portable by the Unicode
 * normalization stability policy.
 */
object NormalizeImpl {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == 0x0b || c == 0xa0 || c == 0x1680 ||
      (c >= 0x2000 && c <= 0x200a) || c == 0x2028 || c == 0x2029 ||
      c == 0x202f || c == 0x205f || c == 0x3000

  private def isControl(c: Char): Boolean =
    c < 0x20 || c == 0x7f || (c >= 0x80 && c <= 0x9f)

  def normalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      if (isWs(c)) pendingSpace = true
      else if (!isControl(c)) {
        if (pendingSpace && started) sb.append(' ')
        sb.append(c)
        pendingSpace = false
        started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class NormalizeText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires STRING input, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeImpl.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeImpl.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeFunctions {
  def normalize_text(c: Column): Column =
    Shims.column(NormalizeText(Shims.expression(c)))
}
