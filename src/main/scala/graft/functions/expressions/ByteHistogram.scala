package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Native Catalyst expression: `bins`-bucket byte-value histogram of a
  * binary payload, L1-normalized by payload length (empty payload → all
  * zeros, matching a 0/max(1,len) division).
  *
  * This is the column-form twin of the per-partition stub decoder in
  * [[graft.multimodal.Multimodal.decodePartitions]] — bucket `(b & 0xff) %
  * bins` — so the two decode paths are provably equivalent (asserted in
  * MultimodalSpec). Implemented with `doGenCode` so the whole derivation
  * fuses into whole-stage codegen: one primitive loop over the payload per
  * row, one long[] scratch buffer, no boxing — on a 100 TB multimodal
  * corpus this runs inside the scan task and the payload never leaves it.
  */
case class ByteHistogram(child: Expression, bins: Int) extends UnaryExpression {
  require(bins >= 1 && bins <= 256, s"bins must be in [1, 256], got $bins")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"byte_histogram requires a binary argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ByteHistogram.histogram(input.asInstanceOf[Array[Byte]], bins))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val buf = ctx.freshName("bhBuf")
      val out = ctx.freshName("bhOut")
      val i = ctx.freshName("bhI")
      val n = ctx.freshName("bhN")
      s"""
         |long[] $buf = new long[$bins];
         |for (int $i = 0; $i < $c.length; $i++) {
         |  $buf[($c[$i] & 0xff) % $bins]++;
         |}
         |double $n = (double) java.lang.Math.max(1, $c.length);
         |double[] $out = new double[$bins];
         |for (int $i = 0; $i < $bins; $i++) {
         |  $out[$i] = $buf[$i] / $n;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
  override def prettyName: String = "byte_histogram"
}

object ByteHistogram {
  def histogram(payload: Array[Byte], bins: Int): Array[Double] = {
    val buf = new Array[Long](bins)
    var i = 0
    while (i < payload.length) { buf((payload(i) & 0xff) % bins) += 1; i += 1 }
    val n = math.max(1, payload.length).toDouble
    val out = new Array[Double](bins)
    i = 0
    while (i < bins) { out(i) = buf(i) / n; i += 1 }
    out
  }

  def apply(payload: Column, bins: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ByteHistogram(ColumnBridge.expression(payload), bins))
  }
}
