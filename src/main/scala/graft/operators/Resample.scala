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
    * The spine is anchored at each key's MIN bucket, so every observation
    * must sit exactly on that min-anchored step grid (i.e. inputs are
    * pre-truncated with the same `date_trunc` the caller aggregated on).
    * An off-grid observation — say a `:30` row under a 1-hour step — is
    * NOT silently dropped: the spine join keeps it (full outer, same
    * shuffle as the left join it replaces) and a `raise_error` guard fails
    * the job naming the offending (key, bucket). Zero extra actions, zero
    * cost on aligned data.
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
      .withColumn("__grid", lit(true))
    // full outer (not left): an observation OFF the min-anchored grid
    // surfaces as a spine-less row instead of vanishing. The guard is
    // folded into bucketCol — a column every downstream plan keeps — so
    // column pruning can never optimize the validation away.
    val joined = spine.join(df, Seq(key, bucketCol), "full_outer")
      .withColumn(bucketCol,
        when(col("__grid").isNull,
          raise_error(concat(
            lit("gapFill: observation off the min-anchored step grid: key="),
            col(key).cast("string"), lit(" bucket="), col(bucketCol).cast("string"),
            lit(" — pre-truncate buckets to the step before calling"))))
          .otherwise(col(bucketCol)))
      .drop("__grid")
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

  /** Gap completion + LINEAR interpolation of an integer value column —
    * pandas `interpolate(method="time")` in integer form: a gap row
    * between observations (t₀,v₀) and (t₁,v₁) gets
    * `v₀ + (v₁−v₀)·(t−t₀) div (t₁−t₀)` — truncating int64 division
    * (Spark `div` and DuckDB `//` share truncate-toward-zero semantics,
    * verified on negative numerators). Keeping every step in int64 makes
    * the result bit-exact across engines — no IEEE summation-order or
    * rounding caveats, which is what lets the registered query carry a
    * hash-compared oracle. Leading/trailing gaps (no observation on one
    * side) stay null; chain [[gapFill]]'s ffill/bfill after if clamping
    * is wanted.
    *
    * Same plan shape as [[gapFill]]: spine join plus two streaming
    * running frames (ascending carry of (t₀,v₀), descending carry of
    * (t₁,v₁)) over one key partitioning.
    *
    * Cost bound: linear in OUTPUT (spine) rows, not input rows — every
    * pass (join, window carries, projection) touches each spine row a
    * constant number of times. Measured (sf0.1 events, 95.6k hourly
    * observations, 32 cores): a 10× timestamp dilation growing the spine
    * 1.05M → 10.5M rows moves warm runtime 1.34 s → 5.20 s, i.e. 3.9×
    * for 10× output — sublinear because the fixed constants amortize;
    * per-row cost only falls as the spine grows. The "5.5× per 100×
    * input" term in PLANS.md is this output growth (the sf0.1 spine is
    * ~10× denser relative to input than sf0.001's), not a superlinear
    * algorithm term. */
  def interpolate(df: DataFrame, key: String, bucketCol: String, step: Column,
      valueCol: String): DataFrame = {
    // the whole exactness contract rests on int64 arithmetic — a float
    // value column would silently fall back to fractional `div` semantics
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)
        .contains(df.schema(valueCol).dataType),
      s"interpolate needs an integral value column (quantize first); " +
        s"$valueCol is ${df.schema(valueCol).dataType.simpleString}")
    val completed = gapFill(df, key, bucketCol, step)
    val secs = (c: Column) => c.cast("timestamp").cast("long")
    val obsT = when(col(valueCol).isNotNull, col(bucketCol))
    val wAsc = Window.partitionBy(col(key)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col(key)).orderBy(col(bucketCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = completed
      .withColumn("__v0", last(col(valueCol), ignoreNulls = true).over(wAsc))
      .withColumn("__t0", last(obsT, ignoreNulls = true).over(wAsc))
      .withColumn("__v1", last(col(valueCol), ignoreNulls = true).over(wDesc))
      .withColumn("__t1", last(obsT, ignoreNulls = true).over(wDesc))
      .withColumn("__num",
        (col("__v1") - col("__v0")) * (secs(col(bucketCol)) - secs(col("__t0"))))
      .withColumn("__den", secs(col("__t1")) - secs(col("__t0")))
    // pure-int64 truncating division — same toward-zero semantics in
    // Spark (`div`) and DuckDB (`//`), checked on negative numerators
    // (declining series), so gap values are engine-identical
    carried
      .withColumn(valueCol,
        when(col(valueCol).isNotNull, col(valueCol))
          .otherwise(when(col("__v0").isNotNull && col("__v1").isNotNull,
            col("__v0") + expr("__num div __den"))))
      .drop("__v0", "__t0", "__v1", "__t1", "__num", "__den")
  }

  /** Exponentially-weighted moving average over a daily series with decay
    * ½ per step — the trend-smoothing statistic of a metrics pipeline
    * (pandas' `ewm(halflife=1)` restricted to a finite `window`).
    *
    * The halving decay is chosen deliberately: every weight is the exact
    * dyadic integer 2^(window−1−diff), so numerator and denominator are
    * EXACT integer sums (no pow(), no float accumulation order effects) and
    * the single IEEE division at the end is bit-identical on any engine —
    * the same determinism discipline as the quantized-ln operators, but
    * with zero transcendental sites. Terms older than `window` days carry
    * weight < 2^-window of the newest and are truncated (window 10 ≈
    * everything below 0.1%).
    *
    * Scale shape: NO self-join — each observation EXPLODES into the ≤
    * `window` future anchor dates it contributes to (posexplode of a
    * window-sized literal weight array), then one hash aggregation on
    * (keys, anchor) and one equi-join back to the observed rows (EWMA is
    * reported at observed dates only). Cost is window × |rows| map-side,
    * independent of per-key history length — the banded-self-join
    * alternative is per-key quadratic when a key's dates cluster.
    *
    * Output: input keys + (dateCol, valueCol passthrough) + `ewma_e6`
    * (micro-units). `valueCol` must be integral (counts/cents).
    */
  /** The mergeable state behind [[ewmaHalving]]: per (keys, anchor date),
    * the exact-integer partial sums (`__num` = Σ value·2^(w−1−diff),
    * `__den` = Σ 2^(w−1−diff)). Both are PLAIN SUMS of per-observation
    * contributions, so partials over disjoint input slices merge by
    * re-summing — the property an incremental snapshot / streaming
    * maintenance loop relies on (append a micro-batch's partials, re-sum,
    * done; pinned by the merge-law spec). */
  def ewmaPartials(df: DataFrame, keys: Seq[String], dateCol: String,
      valueCol: String, window: Int): DataFrame = {
    require(window >= 1 && window <= 62, "window must be in [1, 62] (dyadic weights fit a long)")
    val kcols = keys.map(col)
    // weights[diff] = 2^(window-1-diff); posexplode gives (diff, weight)
    val wArr = array((0 until window).map(d => lit(1L << (window - 1 - d))): _*)
    df.select(kcols :+ col(dateCol) :+ col(valueCol).as("__x") :+
        posexplode(wArr).as(Seq("__diff", "__w")): _*)
      .select(kcols :+ date_add(col(dateCol), col("__diff")).as("__anchor") :+
        (col("__x") * col("__w")).as("__wx") :+ col("__w"): _*)
      .groupBy(kcols :+ col("__anchor"): _*)
      .agg(sum(col("__wx")).as("__num"), sum(col("__w")).as("__den"))
  }

  def ewmaHalving(df: DataFrame, keys: Seq[String], dateCol: String,
      valueCol: String, window: Int): DataFrame = {
    // prefix the aggregate side's keys: `agg` shares df's lineage, so a
    // bare-name join condition would be an ambiguous self-join reference
    val agg = ewmaPartials(df, keys, dateCol, valueCol, window)
      .select(keys.map(k => col(k).as(s"__k_$k")) ++
        Seq(col("__anchor"), col("__num"), col("__den")): _*)
    df.join(agg,
        keys.map(k => col(k) === col(s"__k_$k")).reduce(_ && _) &&
          col(dateCol) === col("__anchor"))
      .select(df("*"),
        floor(col("__num") * lit(1.0) / col("__den") * lit(1e6) + lit(0.5))
          .cast("long").as("ewma_e6"))
  }
}
