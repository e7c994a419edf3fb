package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: `(child * mult + add) & mask` with JAVA
  * WRAPPING multiplication.
  *
  * Exists because Spark 4 runs ANSI mode by default, where the `*`
  * operator throws on long overflow — but the multiply-shift hash family
  * ([[graft.functions.PortableHash.family60]]) depends on wrap-around
  * (mod 2^64) semantics, which the mask then reduces to mod 2^mask-width
  * (exact whenever the mask width divides 64... strictly: whenever
  * 2^width divides 2^64, i.e. always). Codegen'd: one fused
  * multiply-add-and per row inside the generated loop.
  */
case class MultiplyShift(child: Expression, mult: Long, add: Long, mask: Long)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"multiply_shift requires a bigint argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    (input.asInstanceOf[Long] * mult + add) & mask

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ($c * ${mult}L + ${add}L) & ${mask}L;")

  override protected def withNewChildInternal(newChild: Expression): MultiplyShift =
    copy(child = newChild)
  override def prettyName: String = "multiply_shift"
}

object MultiplyShift {
  def apply(h: Column, mult: Long, add: Long, mask: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MultiplyShift(ColumnBridge.expression(h), mult, add, mask))
  }
}
