package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: squared L2 distance of two `array<double>`
  * columns — Σ (a_i − b_i)². The per-pair inner loop of product-quantized
  * ANN (codeword assignment and ADC lookup-table construction both run it
  * M·K times per vector), codegen'd for the same reason as [[DotProduct]]:
  * the HOF form is CodegenFallback and allocates per evaluation.
  *
  * Contract: both inputs `array<double>`, equal lengths; null elements are
  * treated as 0.0. Summation is a sequential left fold — the element-order
  * sum the DuckDB oracles mirror. */
case class L2Squared(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall {
      _.dataType match {
        case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
        case _ => false
      }
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2_squared requires two array<double> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yi = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      val d = xi - yi
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("l2N")
      val i = ctx.freshName("l2I")
      val s = ctx.freshName("l2S")
      val d = ctx.freshName("l2D")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ($a.isNullAt($i) ? 0.0 : $a.getDouble($i))
         |            - ($b.isNullAt($i) ? 0.0 : $b.getDouble($i));
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "l2_squared"
}

object L2Squared {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      L2Squared(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
