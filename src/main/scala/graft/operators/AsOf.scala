package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the single right
  * row with the GREATEST right timestamp ≤ the left timestamp, per key —
  * the temporal primitive for feature lookup ("the customer's latest order
  * when this event happened") that an equi-join can't express and a naive
  * inequality join turns into a per-key interval product.
  *
  * Implemented by composing existing operators (the preferred tier before
  * custom plans): tag both sides, union, and carry the last non-null right
  * value forward over a (key, time)-ordered window. Cost is ONE hash
  * shuffle on the key plus one sort — linear at 100 TB, no range fan-out,
  * and the window is rows-bounded (running last), so Spark streams it
  * without buffering partitions.
  *
  * Semantics:
  *  - inclusive: a right row exactly AT the left timestamp is visible
  *    (right sorts before left on ties);
  *  - left rows with no earlier right row get NULLs (left-join shape);
  *  - right must be UNIQUE per (key, ts) — otherwise which same-timestamp
  *    row wins would depend on sort ties. Dedupe with [[latestPerKeyTs]]
  *    (deterministic max_by) first.
  */
object AsOf {

  /** Deterministically collapse right rows to one per (key, ts): the row
    * with the greatest `tieBreak` value wins all `vals`. */
  def latestPerKeyTs(right: DataFrame, key: String, ts: String,
      tieBreak: String, vals: Seq[String]): DataFrame = {
    val aggs = vals.map(v => max_by(col(v), col(tieBreak)).as(v))
    right.groupBy(col(key), col(ts)).agg(aggs.head, aggs.tail: _*)
  }

  /** As-of join `left` with `right`, carrying `rightVals` columns. Output =
    * all left columns + rightVals (names must not collide). */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightVals.forall(!leftCols.contains(_)),
      s"rightVals ${rightVals.intersect(leftCols)} collide with left columns — alias first")
    val l = left.select(
      col(leftKey).as("__key") +: col(leftTs).cast("timestamp").as("__ts") +:
        lit(1).as("__side") +:
        (leftCols.map(col) ++
          rightVals.map(v => lit(null).cast(right.schema(v).dataType).as(v))): _*)
    val r = right.select(
      col(rightKey).as("__key") +: col(rightTs).cast("timestamp").as("__ts") +:
        lit(0).as("__side") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightVals.map(col)): _*)
    // right before left on equal timestamps → inclusive as-of
    val w = Window.partitionBy("__key")
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(l.unionByName(r)) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols ++ rightVals).map(col): _*)
  }
}
