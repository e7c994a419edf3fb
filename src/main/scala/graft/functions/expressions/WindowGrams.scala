package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR: (pos, gram) for every `k`-token window of a
  * token array — the streaming replacement for
  * `explode(transform(sequence(...), i => struct(i, concat_ws(...))))`.
  *
  * The HOF form materializes the ENTIRE window array per input row before
  * the explode — O(tokens · k) string bytes held at once, which for a
  * book-length document is tens of MB of transient garbage per row, and
  * the per-position lambda is interpreted (CodegenFallback) with a closure
  * allocation per element. This generator yields windows one at a time
  * through `GenerateExec`'s iterator protocol: peak memory per row is ONE
  * window, no lambda closures, no intermediate array.
  *
  * Output gram text is identical to the HOF form (`concat_ws(" ", ...)`
  * semantics, null tokens skipped by `UTF8String.concatWs`), so operators
  * can switch construction without touching their oracles. */
case class WindowGrams(child: Expression, k: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 2 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"window_grams requires k >= 2, got $k")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"window_grams requires array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < k) Iterator.empty
    else {
      val n = arr.numElements()
      Iterator.tabulate(n - k + 1) { i =>
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        InternalRow(i.toLong, UTF8String.concatWs(WindowGrams.Space, parts: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WindowGrams =
    copy(child = newChild)
  override def prettyName: String = "window_grams"
}

object WindowGrams {
  private[expressions] val Space = UTF8String.fromString(" ")

  /** (pos long, gram string) generator column over a token-array column. */
  def windows(tokens: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(WindowGrams(ColumnBridge.expression(tokens), k))
  }
}

/** Native Catalyst GENERATOR: each DISTINCT `k`-token window gram of a
  * token array, once — the streaming replacement for
  * `explode(array_distinct(transform(sequence(...), i => concat_ws(...))))`,
  * the shingle relation of the Jaccard/MinHash/decontamination family
  * ([[graft.operators.Dedup.shingles]]).
  *
  * The HOF form materializes the full window array AND a deduplicated copy
  * per input row before the explode, with an interpreted lambda per
  * position; this generator streams windows one at a time and keeps only a
  * hash set of grams already emitted (≤ distinct-gram bytes — strictly
  * less than the HOF form's two transient arrays). Gram text and the
  * emitted SET are identical to the HOF form (`concat_ws` semantics,
  * first-occurrence order vs `array_distinct` order is irrelevant to the
  * join/groupBy consumers), so no oracle changes. */
case class DistinctGrams(child: Expression, k: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("gram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"distinct_grams requires k >= 1, got $k")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"distinct_grams requires array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < k) Iterator.empty
    else {
      val n = arr.numElements()
      val seen = new java.util.HashSet[UTF8String]()
      Iterator.tabulate(n - k + 1) { i =>
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        UTF8String.concatWs(WindowGrams.Space, parts: _*)
      }.filter(seen.add).map(g => InternalRow(g))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctGrams =
    copy(child = newChild)
  override def prettyName: String = "distinct_grams"
}

object DistinctGrams {
  /** (gram string) generator column over a token-array column. */
  def grams(tokens: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DistinctGrams(ColumnBridge.expression(tokens), k))
  }
}
