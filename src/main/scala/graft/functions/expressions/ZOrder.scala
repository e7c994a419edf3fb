package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Morton (Z-order) code — interleaves the
  * low 31 bits of two non-negative long bucket ids (x gets the even bit
  * positions, y the odd) into one non-negative long whose natural ordering
  * follows the Z space-filling curve.
  *
  * The multi-dimensional clustering primitive for data layout: sorting a
  * write by `zorder(bucket(a), bucket(b))` co-locates rows that are close
  * in BOTH dimensions, so parquet row-group min/max stats prune scans
  * filtered on EITHER column — where a lexicographic sort only serves its
  * leading column (the technique behind Z-ordered table layouts in modern
  * lakehouse engines; Morton, 1966).
  *
  * Inputs are masked to 31 bits (callers bucket raw values first, see
  * [[graft.io.Layout.bucketize]]); the result stays below 2^62 so signed
  * long comparison equals unsigned curve order. Bit spreading uses the
  * O(log w) mask-shift construction — branch-free, codegen-friendly.
  */
case class ZOrder(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder requires two bigint arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      def spreadJava(in: String, out: String): String =
        s"""
           |long $out = $in & 0x7FFFFFFFL;
           |$out = ($out | ($out << 16)) & 0x0000FFFF0000FFFFL;
           |$out = ($out | ($out << 8))  & 0x00FF00FF00FF00FFL;
           |$out = ($out | ($out << 4))  & 0x0F0F0F0F0F0F0F0FL;
           |$out = ($out | ($out << 2))  & 0x3333333333333333L;
           |$out = ($out | ($out << 1))  & 0x5555555555555555L;
         """.stripMargin
      val sx = ctx.freshName("zoX")
      val sy = ctx.freshName("zoY")
      s"""
         |${spreadJava(x, sx)}
         |${spreadJava(y, sy)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "zorder"
}

object ZOrder {

  /** Spread the low 31 bits of v to even bit positions (0, 2, 4, …). */
  def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Morton code: x on even bits, y on odd bits. Always ≥ 0. */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  def zorder(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ZOrder(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long"))))
  }
}
