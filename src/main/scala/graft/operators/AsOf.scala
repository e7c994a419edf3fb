package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the single right
  * row temporally closest to it, per key — the temporal primitive for
  * feature lookup ("the customer's latest order when this event happened")
  * that an equi-join can't express and a naive inequality join turns into a
  * per-key interval product.
  *
  * Directions (pandas merge_asof's surface, DuckDB ASOF's semantics):
  *  - `backward` (default): greatest right ts ≤ left ts — inclusive;
  *  - `forward`: smallest right ts ≥ left ts — inclusive;
  *  - `nearest`: smaller absolute gap of the two; exact ties go backward.
  * An optional `toleranceMicros` nulls the match when the gap exceeds it
  * (left rows always survive; left-join shape).
  *
  * Implemented by composing existing operators (the preferred tier before
  * custom plans): tag both sides, union, and carry the adjacent right
  * values across a (key, time)-ordered window. Cost is ONE hash shuffle on
  * the key plus a sort per needed direction (two for `nearest`) — linear at
  * 100 TB, no range fan-out, and the frames are rows-bounded running
  * last/first, so Spark streams them without buffering partitions.
  *
  * Right must be UNIQUE per (key, ts) — dedupe with [[latestPerKeyTs]]
  * (deterministic max_by) first.
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
      rightVals: Seq[String], direction: String = "backward",
      toleranceMicros: Long = Long.MaxValue): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(toleranceMicros > 0, "tolerance must be positive")
    val leftCols = left.columns.toSeq
    require(rightVals.forall(!leftCols.contains(_)),
      s"rightVals ${rightVals.intersect(leftCols)} collide with left columns — alias first")

    // NULL keys never match (DuckDB ASOF / pandas merge_asof equality
    // semantics). Window.partitionBy would group all nulls into one
    // partition and happily pair them, so null-key left rows are set aside
    // (they survive unmatched — left-join shape) and null-key right rows
    // are dropped before the union+window.
    val leftNullKeys = left.filter(col(leftKey).isNull)
    val left0 = left.filter(col(leftKey).isNotNull)
    val right0 = right.filter(col(rightKey).isNotNull)

    // carried payload = rightVals plus the matched right timestamp (needed
    // for nearest's gap comparison and for tolerance)
    val l = left0.select(
      col(leftKey).as("__key") +: col(leftTs).cast("timestamp").as("__ts") +:
        lit(1).as("__side") +:
        (leftCols.map(col) ++
          rightVals.map(v => lit(null).cast(right.schema(v).dataType).as(v)) :+
          lit(null).cast("timestamp").as("__rts")): _*)
    val r = right0.select(
      col(rightKey).as("__key") +: col(rightTs).cast("timestamp").as("__ts") +:
        lit(0).as("__side") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightVals.map(col) :+ col(rightTs).cast("timestamp").as("__rts")): _*)
    val unioned = l.unionByName(r)
    val carryCols = rightVals :+ "__rts"

    // right before left on equal timestamps → inclusive backward
    val wBack = Window.partitionBy("__key")
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward = running last over the REVERSED sort. The direct encoding
    // (first over CURRENT ROW .. UNBOUNDED FOLLOWING) hits Spark's
    // UnboundedFollowingWindowFunctionFrame, which re-evaluates the
    // aggregate from the current row to partition end for EVERY row —
    // O(n²) per (key) partition, a real cliff on hot keys at scale. The
    // descending running frame is the streaming O(n) equivalent: at equal
    // timestamps the right row (side 0) sorts first so it is already in
    // the left row's frame → inclusive forward.
    val wFwd = Window.partitionBy("__key")
      .orderBy(col("__ts").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def carry(df: DataFrame, w: WindowSpec, suffix: String): DataFrame =
      carryCols.foldLeft(df) { (d, v) =>
        d.withColumn(v + suffix, last(col(v), ignoreNulls = true).over(w))
      }

    val gapUs: (Column, Column) => Column = (ts, rts) =>
      abs(unix_micros(ts) - unix_micros(rts))

    val matched = direction match {
      case "backward" => carry(unioned, wBack, "")
      case "forward"  => carry(unioned, wFwd, "")
      case "nearest" =>
        // two sorts, one shuffle (same partitioning); backward wins ties
        val both = carry(carry(unioned, wBack, "__b"), wFwd, "__f")
        val useBack = col("__rts__f").isNull ||
          (col("__rts__b").isNotNull &&
            gapUs(col("__ts"), col("__rts__b")) <= gapUs(col("__ts"), col("__rts__f")))
        carryCols.foldLeft(both) { (d, v) =>
          d.withColumn(v, when(useBack, col(v + "__b")).otherwise(col(v + "__f")))
        }
    }

    val withinTol =
      if (toleranceMicros == Long.MaxValue) matched
      else {
        val ok = col("__rts").isNotNull &&
          gapUs(col("__ts"), col("__rts")) <= toleranceMicros
        rightVals.foldLeft(matched) { (d, v) =>
          d.withColumn(v, when(ok, col(v)).otherwise(lit(null)))
        }
      }

    val matchedOut = withinTol.filter(col("__side") === 1)
      .select((leftCols ++ rightVals).map(col): _*)
    matchedOut.unionByName(leftNullKeys.select(
      leftCols.map(col) ++
        rightVals.map(v => lit(null).cast(right.schema(v).dataType).as(v)): _*))
  }
}
