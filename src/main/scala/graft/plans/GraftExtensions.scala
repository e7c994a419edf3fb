package graft.plans

import graft.functions.expressions.{ByteHistogram, DotProduct, L2Squared, RollingHash, WindowGrams, ZOrder}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's custom Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT rolling_hash(text) ...")` works exactly like the
  * Column API.
  *
  * Two installation paths, same function list:
  *  - builder-time (config `spark.sql.extensions=graft.plans.GraftExtensions`
  *    or `SparkSession.builder.withExtensions(new GraftExtensions)`);
  *  - [[GraftExtensions.install]] on an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => ApproxDistinctRewrite())
  }
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "rolling_hash(text) takes exactly 1 argument")
        RollingHash(args.head)
      }),
    (
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes exactly 2 arguments")
        DotProduct(args(0), args(1))
      }),
    (
      FunctionIdentifier("window_grams"),
      new ExpressionInfo(classOf[WindowGrams].getName, "window_grams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "window_grams(tokens, k) takes exactly 2 arguments")
        require(args(1).foldable, "window_grams k must be a literal")
        WindowGrams(args(0), args(1).eval().asInstanceOf[Number].intValue())
      }),
    (
      FunctionIdentifier("l2_squared"),
      new ExpressionInfo(classOf[L2Squared].getName, "l2_squared"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "l2_squared(a, b) takes exactly 2 arguments")
        L2Squared(args(0), args(1))
      }),
    (
      FunctionIdentifier("byte_histogram"),
      new ExpressionInfo(classOf[ByteHistogram].getName, "byte_histogram"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "byte_histogram(bytes, bins) takes exactly 2 arguments")
        require(args(1).foldable, "byte_histogram bins must be a literal")
        ByteHistogram(args(0), args(1).eval().asInstanceOf[Number].intValue())
      }),
    (
      FunctionIdentifier("z_order"),
      new ExpressionInfo(classOf[ZOrder].getName, "z_order"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "z_order(a, b) takes exactly 2 arguments")
        ZOrder(args(0), args(1))
      }))

  /** Register on a live session (extensions only apply at builder time).
    * Optimizer rules go through `experimental.extraOptimizations` on this
    * path; guarded for idempotence. */
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[ApproxDistinctRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRewrite()
  }
}
