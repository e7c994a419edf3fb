package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid completion + forward fill — the Spark form of pandas'
  * `resample().ffill()` (the reference pipeline's pandas idiom for
  * per-entity time series with missing buckets).
  *
  * Input: one row per (key, bucket) — pre-aggregate with a `groupBy` on
  * `date_trunc` first. [[gapFill]] then (1) builds each key's dense
  * bucket spine from its own min..max bucket via `sequence` + `explode`,
  * (2) left-joins the observed rows onto the spine, (3) zero-fills
  * counters and (4) forward-fills carried values with a running
  * `last(ignoreNulls)` window.
  *
  * Scale shape: the spine join is a (key, bucket) equi-join — ONE hash
  * shuffle — and the forward fill is a rows-bounded running frame over
  * the same key partitioning, which Spark evaluates streaming (no
  * per-row rescan, no partition buffering). Fan-out bound: each key
  * emits (max−min)/step buckets, so a key alive for a year at hourly
  * step is ~8.8k rows — skew comes from LIFETIME, not traffic; cap the
  * spine by windowing the input time range if keys live arbitrarily
  * long.
  */
object Resample {

  /** Complete each key's bucket grid and fill gaps.
    *
    * @param df        one row per (key, bucket)
    * @param key       entity column
    * @param bucketCol time-bucket column (timestamp; pre-truncated)
    * @param step      spine stride, e.g. `expr("interval 1 hour")`
    * @param zeroFill  columns reset to a constant on gap rows (counters)
    * @param ffill     columns carried forward from the last observed row
    * @param bfill     columns carried BACKWARD from the next observed row
    *                  (applied after ffill: a column in both gets ffill
    *                  first, then bfill patches the leading gap — pandas'
    *                  `.ffill().bfill()` composition). The backward carry
    *                  is a running frame over the DESCENDING bucket order
    *                  — same key partitioning, still streaming; never the
    *                  per-row-re-evaluated UnboundedFollowing frame.
    */
  def gapFill(df: DataFrame, key: String, bucketCol: String, step: Column,
      zeroFill: Map[String, Column] = Map.empty,
      ffill: Seq[String] = Nil,
      bfill: Seq[String] = Nil): DataFrame = {
    val bounds = df.groupBy(col(key))
      .agg(min(col(bucketCol)).as("__b0"), max(col(bucketCol)).as("__b1"))
    val spine = bounds.select(
      col(key), explode(sequence(col("__b0"), col("__b1"), step)).as(bucketCol))
    val joined = spine.join(df, Seq(key, bucketCol), "left")
    val zeroed = zeroFill.foldLeft(joined) { case (d, (c, z)) =>
      d.withColumn(c, coalesce(col(c), z))
    }
    val w = Window.partitionBy(col(key)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = ffill.foldLeft(zeroed) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val wDesc = Window.partitionBy(col(key)).orderBy(col(bucketCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bfill.foldLeft(filled) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(wDesc))
    }
  }
}
