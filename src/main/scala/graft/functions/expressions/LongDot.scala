package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: dot product of two `array<long>` columns —
  * the integer sibling of [[DotProduct]], for the exact-arithmetic
  * similarity tier (quantized-embedding cosine tests, centered PC
  * projections) where every value is an e3/e6-scaled int64.
  *
  * Exists for the same reason as [[DotProduct]]: the higher-order-function
  * form (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) allocates an
  * intermediate array and interprets its lambdas outside whole-stage
  * codegen. This compiles to a primitive long loop inside the generated
  * plan — no allocation, no boxing — which is what keeps a panel×corpus
  * decontamination scan compute-bound at 100 TB.
  *
  * Contract: both inputs `array<long>`; iteration runs over the shorter
  * length; null elements contribute 0. Callers own overflow budgeting
  * (e3-quantized inputs keep 64-term dots ≤ ~2·10⁷ — documented at each
  * call site). */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall {
      _.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      }
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"long_dot requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("ldN")
      val i = ctx.freshName("ldI")
      val s = ctx.freshName("ldS")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "long_dot"
}

object LongDot {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      LongDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
