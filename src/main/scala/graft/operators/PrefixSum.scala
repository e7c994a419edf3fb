package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed running total (inclusive prefix sum) under a global total
  * order — the scan primitive behind budgeted corpus selection ("take
  * documents best-first until the token budget is spent"), cumulative
  * mixture curves, and quota lines.
  *
  * The naive form — `sum(v).over(Window.orderBy(keys))` with no partition
  * clause — funnels every row through ONE task, the same impossibility
  * [[GlobalIndex]] documents for global ranks. Same cure, adapted to
  * sums (two-phase scan):
  *
  *  1. range-repartition by the order keys and sort within partitions —
  *     partition i holds keys strictly before partition i+1's;
  *  2. one in-order pass per partition (`mapPartitions` — per-partition
  *     imperative logic is exactly what it is for) accumulates the LOCAL
  *     running sum, needing no window and no extra exchange; the
  *     partition tag comes from the `spark_partition_id()` EXPRESSION,
  *     never `TaskContext.getPartitionId()` — an expression is
  *     initialized with its own RDD's split index, which survives a
  *     downstream `coalesce(1)` (e.g. a single-file write), while the
  *     TaskContext id is the MERGED task's index: every pre-coalesce
  *     partition would report pid 0, silently matching offset 0;
  *  3. per-partition totals (one row per partition) are prefix-summed
  *     into starting offsets — the only unpartitioned window runs over
  *     |partitions| rows — and broadcast back; global running total =
  *     partition offset + local running sum.
  *
  * The scanned frame feeds both the totals aggregate and the final join;
  * the range exchange below them is deterministic and AQE reuses it as a
  * single shuffle stage (verified on the sibling GlobalIndex shape), so
  * the input is scanned and shuffled once, with only the cheap in-order
  * pass above the exchange running per consumer.
  */
object PrefixSum {

  /** (input columns…, `totalName`) with `totalName` = inclusive running
    * total of `value` under `order`. Pass a TOTAL order (include a unique
    * id as the last key) — with ties the result would depend on partition
    * placement. Null `value`s count as 0. */
  def runningTotal(df: DataFrame, totalName: String, value: Column, order: Column*): DataFrame = {
    require(order.nonEmpty, "runningTotal needs at least one ordering column")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val withV = df.withColumn("__v", coalesce(value.cast("long"), lit(0L)))
    val vIdx = withV.schema.fieldIndex("__v")
    // spark_partition_id() is nondeterministic to Catalyst, which also
    // pins it above the range exchange + sort
    val sorted = withV.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
    val outSchema = sorted.schema.add("__run", LongType)
    val scanned = sorted.mapPartitions { rows =>
      var acc = 0L
      rows.map { r =>
        acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    // partition total from the values, not max(__run) — negative deltas
    // (sweep-line style) make the last running sum ≠ the max
    val offsets = scanned.groupBy(col("__pid")).agg(sum(col("__v")).as("__total"))
      .withColumn("__offset",
        coalesce(
          sum(col("__total")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    scanned.join(broadcast(offsets), Seq("__pid"))
      .withColumn(totalName, col("__run") + col("__offset"))
      .drop("__v", "__pid", "__run", "__offset")
  }

  /** Several running totals under ONE total order in ONE two-phase scan —
    * the k-column generalization of [[runningTotal]]. Chaining k single
    * calls pays k range exchanges and k offset joins over the same frame
    * (the `ks_two_sample` CDF pair was the motivating case: two chained
    * scans doubled the exchange count); this pays one of each, with the
    * in-order pass carrying k accumulators and the offsets table one
    * k-sum row per partition. Same ordering contract as [[runningTotal]]:
    * pass a TOTAL order. */
  def runningTotals(df: DataFrame, totals: Seq[(String, Column)],
      order: Column*): DataFrame = {
    require(order.nonEmpty, "runningTotals needs at least one ordering column")
    require(totals.nonEmpty, "runningTotals needs at least one value column")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val k = totals.size
    val withV = totals.zipWithIndex.foldLeft(df) { case (d, ((_, v), i)) =>
      d.withColumn(s"__v$i", coalesce(v.cast("long"), lit(0L)))
    }
    val vIdx = (0 until k).map(i => withV.schema.fieldIndex(s"__v$i"))
    val sorted = withV.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
    val outSchema = (0 until k).foldLeft(sorted.schema)((s, i) => s.add(s"__run$i", LongType))
    val scanned = sorted.mapPartitions { rows =>
      val acc = new Array[Long](k)
      rows.map { r =>
        var i = 0
        while (i < k) { acc(i) += r.getLong(vIdx(i)); i += 1 }
        Row.fromSeq(r.toSeq ++ acc.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    val offsets = scanned.groupBy(col("__pid"))
      .agg(sum(col("__v0")).as("__t0"),
        (1 until k).map(i => sum(col(s"__v$i")).as(s"__t$i")): _*)
    val wOff = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets2 = (0 until k).foldLeft(offsets) { (d, i) =>
      d.withColumn(s"__off$i", coalesce(sum(col(s"__t$i")).over(wOff), lit(0L)))
    }.select(col("__pid") +: (0 until k).map(i => col(s"__off$i")): _*)
    val joined = scanned.join(broadcast(offsets2), Seq("__pid"))
    val withTotals = totals.zipWithIndex.foldLeft(joined) { case (d, ((name, _), i)) =>
      d.withColumn(name, col(s"__run$i") + col(s"__off$i"))
    }
    val drop = Seq("__pid") ++ (0 until k).flatMap(i => Seq(s"__v$i", s"__run$i", s"__off$i"))
    withTotals.drop(drop: _*)
  }

  /** Per-group running total under a per-group order — "spend each
    * source's budget best-first" — without `Window.partitionBy(group)`,
    * which would collapse a 100 TB source into one task. Same two-phase
    * scan as [[runningTotal]] with the group prepended to the range
    * keys: groups are contiguous within and ACROSS partitions, the
    * in-order pass resets its accumulator at group changes, and the
    * offset table becomes one row per (partition, group-slice) — bounded
    * by partitions + groups, prefix-summed per group over partition ids.
    * `order` must be total within a group (end with a unique id). */
  def runningTotalByGroup(df: DataFrame, totalName: String, value: Column,
      group: Column, order: Column*): DataFrame = {
    require(order.nonEmpty, "runningTotalByGroup needs at least one ordering column")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val withV = df.withColumn("__v", coalesce(value.cast("long"), lit(0L)))
      .withColumn("__g", group)
    val vIdx = withV.schema.fieldIndex("__v")
    val gIdx = withV.schema.fieldIndex("__g")
    val keys = (col("__g") +: order).toSeq
    val sorted = withV.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
    val outSchema = sorted.schema.add("__run", LongType)
    val scanned = sorted.mapPartitions { rows =>
      var acc = 0L
      var cur: Any = null
      var first = true
      rows.map { r =>
        val g = r.get(gIdx)
        if (first || !java.util.Objects.equals(cur, g)) { acc = 0L; cur = g; first = false }
        acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    // one row per (partition, group-slice); a group spanning p partitions
    // contributes p rows — the whole table is ≤ partitions + groups rows
    val offsets = scanned.groupBy(col("__pid"), col("__g").as("__og"))
      .agg(sum(col("__v")).as("__total"))
      .withColumn("__offset",
        coalesce(
          sum(col("__total")).over(
            Window.partitionBy(col("__og")).orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__og"), col("__offset"))
    scanned.join(broadcast(offsets),
        scanned("__pid") === offsets("__pid") && scanned("__g") <=> col("__og"))
      .drop(offsets("__pid"))
      .withColumn(totalName, col("__run") + col("__offset"))
      .drop("__v", "__g", "__pid", "__run", "__og", "__offset")
  }
}
