package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass within-document repetition counter — the codegen'd replacement
 * for the interpreted `aggregate`-over-`array_sort` fold that was the
 * bench's slowest per-row expression (~3.5 s/pass at sf0.1): higher-order
 * function lambdas evaluate interpreted and allocate a struct per element,
 * while this is a single static call inside whole-stage codegen.
 *
 * Semantics are IDENTICAL to the SQL form
 * `aggregate(array_sort(windows), …)` over
 * `transform(sequence(1, greatest(size(tk)-n+1, 1)), i -> concat_ws(' ',
 * slice(tk, i, n)))` with `tk = split(lower(text), '\s+')`:
 * tokenization is Spark's own `UTF8String.toLowerCase` + regex split with
 * limit -1 (trailing empties kept), short docs collapse to one whole-doc
 * window, and (nw, nd, top) = total windows, distinct windows, max
 * occurrence count — counts don't depend on sort order, so a hash count
 * replaces the sort+run-scan with the same result in O(d) per row.
 */
object RepStatsImpl {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int): GenericInternalRow = {
    val tokens = Whitespace.split(text.toLowerCase.toString, -1)
    val nTok = tokens.length
    val nWin = math.max(nTok - n + 1, 1)
    val width = math.min(n, nTok)
    val counts = new java.util.HashMap[String, Array[Long]]()
    var top = 0L
    var w = 0
    while (w < nWin) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(w + j))
        j += 1
      }
      val key = sb.toString
      var c = counts.get(key)
      if (c == null) { c = new Array[Long](1); counts.put(key, c) }
      c(0) += 1
      if (c(0) > top) top = c(0)
      w += 1
    }
    new GenericInternalRow(Array[Any](nWin.toLong, counts.size().toLong, top))
  }
}

case class RepStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "window width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rep_stats requires STRING input, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("nw", LongType, nullable = false),
    StructField("nd", LongType, nullable = false),
    StructField("top", LongType, nullable = false)))
  override def prettyName: String = "rep_stats"

  override def nullSafeEval(input: Any): Any =
    RepStatsImpl.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepStatsImpl.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

object RepStatsFunctions {
  /** (nw, nd, top) repetition counts of n-token windows over `text`. */
  def rep_stats(text: Column, n: Int): Column =
    Shims.column(RepStats(Shims.expression(text), n))
}
