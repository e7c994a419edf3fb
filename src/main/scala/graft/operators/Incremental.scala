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

  /** RETRACTABLE partials over a CHANGELOG — [[partials]] for inputs that
    * carry deletes, the aggregate-level dual of the row-level CDC sinks
    * ([[graft.streaming.VersionedSnapshot.mergeSink]]): each change row is
    * (op = +1 insert / −1 retract), and count/sum absorb both signs
    * because (ℤ, +) is a GROUP, not just a monoid — a retraction is the
    * inverse element, so `merge(partials(log))` equals the aggregate of
    * the live rows in ANY delivery order, without reading history.
    *
    * min/max are deliberately ABSENT: they have no inverse (retracting
    * the current extremum invalidates the stored bound — recovering it
    * needs the full value multiset), which is the standard retract-agg
    * split (e.g. Flink's retraction streams keep per-key state for
    * min/max). Callers needing bounds under deletes keep a value-level
    * snapshot (the MoR tier) or accept refresh-on-retract.
    *
    * `opCol` must be ±1; enforced distributed-side (codegen assert), so a
    * malformed changelog fails loudly before corrupting the snapshot. */
  def retractPartials(changelog: DataFrame, keys: Seq[String],
      valueCol: Column, opCol: Column): DataFrame = {
    val op = opCol.cast("long")
    changelog
      .withColumn("__opchk", assert_true(op === 1L || op === -1L,
        lit("retractPartials op column must be +1 (insert) or -1 (retract)")))
      .filter(col("__opchk").isNull)
      .groupBy(keys.map(col): _*).agg(
        sum(op).as("n"),
        sum(op * valueCol).as("sum_v"))
  }

  /** Merge retractable snapshots (associative + commutative, like
    * [[merge]]); keys whose live count reaches zero DISAPPEAR — exactly
    * what a full recompute over the live rows would produce. A negative
    * merged count means the changelog retracted rows it never inserted;
    * that is corrupt input, failed loudly rather than clamped. */
  def retractMerge(snapshots: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(snapshots.nonEmpty, "nothing to merge")
    snapshots.reduce(_ unionByName _).groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sum_v")).as("sum_v"))
      .withColumn("__nchk", assert_true(col("n") >= 0,
        lit("retractMerge: net count went negative — changelog retracted " +
          "rows that were never inserted")))
      .filter(col("__nchk").isNull).drop("__nchk")
      .filter(col("n") > 0)
  }

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
