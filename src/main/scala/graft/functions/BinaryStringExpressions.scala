package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expressions for the binary-string codec (SURVEY.md C1/C2).
 *
 * Implemented as native `UnaryExpression`s with `doGenCode` (not Scala UDFs)
 * so they participate in whole-stage codegen — the generated code is a single
 * static call into [[BytesBinaryCodec]], no closure/serialization overhead and
 * no codegen-fallback barrier in the plan.
 */
case class ToStringBinary(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"to_string_binary requires BINARY input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "to_string_binary"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(BytesBinaryCodec.encode(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.BytesBinaryCodec.encode($c))")

  override protected def withNewChildInternal(newChild: Expression): ToStringBinary =
    copy(child = newChild)
}

case class ToBytesBinary(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"to_bytes_binary requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "to_bytes_binary"

  override def nullSafeEval(input: Any): Any =
    BytesBinaryCodec.decode(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BytesBinaryCodec.decode($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): ToBytesBinary =
    copy(child = newChild)
}

/** Column-API + SQL registration surface for the graft function library. */
object GraftFunctions {
  def to_string_binary(c: Column): Column =
    Shims.column(ToStringBinary(Shims.expression(c)))

  def to_bytes_binary(c: Column): Column =
    Shims.column(ToBytesBinary(Shims.expression(c)))

  /** Register SQL-callable versions: `SELECT to_string_binary(rowKey) ...`. */
  def register(spark: SparkSession): Unit = {
    Shims.registerFunction(spark, "to_string_binary", es => ToStringBinary(es.head))
    Shims.registerFunction(spark, "to_bytes_binary", es => ToBytesBinary(es.head))
  }
}
