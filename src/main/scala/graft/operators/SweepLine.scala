package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweep-line as a DISTRIBUTED two-phase prefix sum.
  *
  * Peak concurrency ("how many intervals were live at once") is classically
  * a global sort + running sum of +1/−1 endpoint deltas — which on Spark
  * means `Window.orderBy(t)` with NO partition key: every endpoint funnels
  * through one task. This operator keeps the sweep parallel:
  *
  *  1. endpoints are bucketed into coarse time segments (default: day) —
  *     the running sum within each segment is a key-partitioned window,
  *     sorted and summed in parallel;
  *  2. each segment's NET delta (one row per segment) is prefix-summed
  *     into a starting offset — the only unpartitioned window runs over
  *     per-segment totals, bounded by the time span (365 rows/year), the
  *     same documented pattern as Packing's per-group totals;
  *  3. live count = segment offset + within-segment running sum; one
  *     final max aggregates the peak.
  *
  * Intervals crossing segment boundaries need no splitting: their +1
  * lives in an earlier segment and reaches later segments through the
  * offset. Tie order at equal timestamps puts −1 before +1, so an
  * interval ending exactly when another starts does NOT overlap it
  * (half-open [start, end) semantics — mirror the same ORDER BY in any
  * oracle).
  */
object SweepLine {

  /** 1-row result: the maximum number of concurrently-live intervals.
    * `segment` maps an endpoint timestamp to its sweep bucket — coarse
    * enough that per-segment totals stay tiny, fine enough to spread the
    * sort (default: calendar day). */
  def peakConcurrent(df: DataFrame, start: Column, end: Column,
      segment: Column => Column = date_trunc("day", _)): DataFrame = {
    // both endpoints come out of ONE pass over each input row (explode of
    // a 2-element array) — a unionAll of two selects would scan `df` once
    // per branch, and with two consumers below (the window and the totals
    // aggregate) that compounds to 4 scans of the source where this shape
    // costs 2
    val pts = df
      .select(explode(array(
        struct(start.as("t"), lit(1L).as("delta")),
        struct(end.as("t"), lit(-1L).as("delta")))).as("p"))
      .select(col("p.t").as("t"), col("p.delta").as("delta"))
      .withColumn("seg", segment(col("t")))
    val wIn = Window.partitionBy("seg")
      .orderBy(col("t").asc, col("delta").asc) // −1 first: [start, end)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = pts.withColumn("live_in", sum("delta").over(wIn))
    val totals = pts.groupBy("seg").agg(sum("delta").as("seg_total"))
    // unpartitioned BUT bounded: one row per segment
    val wOff = Window.orderBy(col("seg").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.withColumn(
      "offset", coalesce(sum("seg_total").over(wOff), lit(0L)))
    within.join(offsets, Seq("seg"))
      .agg(max(col("live_in") + col("offset")).as("peak_concurrent"))
  }
}
