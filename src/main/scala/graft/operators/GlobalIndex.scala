package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global row numbering at cluster scale.
  *
  * The naive form — `row_number().over(Window.orderBy(key))` with no
  * partition clause — collapses the whole dataset into ONE task (Spark
  * even warns about it); at 100 TB that is not slow, it is impossible.
  * The classic scalable construction used here:
  *
  *   1. range-repartition by the key, sort within partitions — partition
  *      boundaries are sampled, but partition i holds keys strictly below
  *      partition i+1's;
  *   2. local 0-based offsets per partition (parallel, no cross-partition
  *      state, no extra exchange — see [[withGlobalIndex]]);
  *   3. per-partition row counts (a few-KB aggregate) → cumulative
  *      offsets, broadcast back; global index = offset + local rank.
  *
  * The result is IDENTICAL to the single-task window — offset + local
  * rank is exactly the global rank for any boundary placement — while the
  * only non-parallel state is one row per partition. Training pipelines
  * use this for contiguous example ids and (with a hash key) for
  * deterministic epoch shuffles: ordering by a seeded portable hash of
  * the id is a reproducible permutation that needs no stored shuffle
  * file, yet never materializes a global sort on one node.
  */
object GlobalIndex {

  /** (input columns…, `idxName`) with `idxName` = 0-based contiguous rank
    * of the row under `order` (ties broken by nothing — pass a total
    * order, e.g. include a unique id as the last column).
    *
    * The local rank comes from `monotonically_increasing_id` — which Spark
    * defines as (partitionId << 33) | within-partition offset — evaluated
    * AFTER the within-partition sort, so it needs NO window and NO second
    * exchange (a `row_number` window partitioned by the partition id would
    * re-shuffle the whole dataset by pid even though each range partition
    * already holds exactly one pid). The id expression is nondeterministic
    * to Catalyst, which is what stops it being pushed below the sort. The
    * only full-data movement is the range repartition itself.
    *
    * Bound: the id encoding caps a single partition at 2^33 (~8.6 B) rows
    * — size `spark.sql.shuffle.partitions` so no range partition
    * approaches that (at 100 TB / 10k partitions that is ~10 GB of rows
    * per partition, three orders of magnitude inside the bound). */
  def withGlobalIndex(df: DataFrame, idxName: String, order: Column*): DataFrame = {
    require(order.nonEmpty, "withGlobalIndex needs at least one ordering column")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val local = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__local", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
    // per-partition counts → exclusive prefix sum; the running-total window
    // is fine unpartitioned — it runs over |partitions| rows, not the data
    val offsets = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(
          sum(col("__cnt")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(idxName, col("__offset") + col("__local"))
      .drop("__mid", "__pid", "__local", "__offset")
  }
}
