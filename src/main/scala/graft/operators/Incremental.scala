package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key snapshot of
  * MERGEABLE partials — (count, sum, min, max) form a commutative monoid —
  * and refresh it by aggregating only the new batch and merging, never by
  * rescanning history. At 100 TB this is the difference between a daily
  * snapshot refresh that reads one day and one that reads three years;
  * it is also exactly Spark's own partial-aggregation contract
  * (map-side combine) lifted to pipeline granularity, so
  * `merge(partials(a), partials(b)) == partials(a ∪ b)` by the same
  * algebra Spark relies on internally.
  *
  * Non-mergeable derived values (avg) are computed FROM the partials at
  * read time ([[withAvg]]), never stored — storing avg would make the
  * snapshot unmergeable. Values should be exact integers (e.g. cents) if
  * cross-engine/re-run bit-stability of sums matters: integer sums are
  * order-independent, double sums are not.
  */
object Incremental {

  /** Aggregate one batch into mergeable partials per key. */
  def partials(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(valueCol).as("sum_v"),
      min(valueCol).as("min_v"),
      max(valueCol).as("max_v"))

  /** Merge partial snapshots (any number, any overlap of keys) into one
    * snapshot of the same shape — associative and commutative, so a
    * scheduler can fold new days in any order. */
  def merge(snapshots: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(snapshots.nonEmpty, "nothing to merge")
    snapshots.reduce(_ unionByName _).groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sum_v")).as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))
  }

  /** Derive avg at read time: one IEEE division over exact partials —
    * bit-identical on any engine when `sum_v` is integral. */
  def withAvg(snapshot: DataFrame): DataFrame =
    snapshot.withColumn("avg_v",
      col("sum_v").cast("double") / col("n").cast("double"))

  /** Incremental equi-JOIN view maintenance (insert-only delta-join): for
    * a materialized inner-join view V = A ⋈ B, new batches ΔA and ΔB
    * contribute exactly
    *
    *     ΔV  =  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * where A and B are the PRE-batch snapshots — the bilinearity of join
    * ((A+ΔA) ⋈ (B+ΔB) expands to four terms, V is the first), the same
    * derivative differential/DBSP systems compute. The three terms are
    * pairwise disjoint (each new pair has a new row on the left, the
    * right, or both — never zero), so ΔV is exact and duplicate-free and
    * V ∪ ΔV equals the full recomputation (spec-asserted; the registered
    * query proves it against a full-join oracle).
    *
    * Cost shape: every term has a DELTA on at least one side, so the
    * refresh reads O(|Δ|) plus index probes of the snapshots on the
    * delta's keys — never a rescan of A ⋈ B. At 100 TB, snapshots stored
    * bucketed by the join key ([[graft.io.Bucketing]] /
    * [[graft.streaming.VersionedSnapshot]]'s bucketed layout) make the
    * two snapshot probes shuffle-free on the snapshot side; the tiny
    * ΔA ⋈ ΔB term broadcasts.
    *
    * `keys` are USING-columns (same names both sides); all non-key
    * column names must be disjoint across A and B, as in any join view. */
  def joinDelta(aOld: DataFrame, bOld: DataFrame,
      aDelta: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinDelta needs at least one join key")
    val overlap = (aOld.columns.toSet -- keys).intersect(bOld.columns.toSet -- keys)
    require(overlap.isEmpty, s"non-key columns collide across sides: $overlap — alias first")
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))
  }
}
