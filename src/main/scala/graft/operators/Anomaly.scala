package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly flags over a daily integer series — the
  * metrics-monitoring primitive ("is today's count k sigmas from its
  * trailing baseline?") in a form with ZERO floating point anywhere.
  *
  * The z-test `|x − μ| > k·σ` over a trailing window of n observations
  * multiplies out to the pure-integer inequality
  *
  *     (n·x − Σx)² > k² · (n·Σx² − (Σx)²)
  *
  * (both sides scaled by n²·σ²'s denominator): Σx and Σx² are exact
  * integer sums, so the comparison is bit-identical on any engine — no
  * stddev(), no division, no quantization step at all. The baseline
  * window EXCLUDES the current day (an anomaly must not drag its own
  * baseline), and days with fewer than `minN` prior observations are
  * never flagged (a 1-day baseline flags everything).
  *
  * Overflow bound: |n·x − Σx| ≤ 2·window·max|x| on the left and
  * k²·(n·Σx² − (Σx)²) ≤ k²·window²·max(x)² on the right, so the binding
  * constraint is window²·max(4, k²)·max(x)² < 2⁶³ — e.g. |x| ≲ 10⁸ at
  * window 10, k 3. Daily event counts at 100 TB sit far below that, and
  * the operator ENFORCES it: every observation passes through a codegen
  * `assert_true(|x| ≤ bound)`, so an out-of-range series fails loudly
  * instead of silently wrapping the comparison.
  *
  * Scale shape: same as [[Resample.ewmaPartials]] — each observation
  * EXPLODES into the `window` future anchor dates it baselines (narrow),
  * one hash aggregation on (keys, anchor), one equi-join back to the
  * observed rows. No self-join, no per-key quadratic term, cost
  * window × rows map-side.
  */
object Anomaly {

  def rollingZScoreFlags(df: DataFrame, keys: Seq[String], dateCol: String,
      valueCol: String, window: Int, k: Int, minN: Int): DataFrame = {
    require(window >= 2, "window must be >= 2 days")
    require(k >= 1, "k must be >= 1 sigma")
    require(minN >= 2 && minN <= window, s"need 2 <= minN <= window, got $minN")
    val kcols = keys.map(col)
    // distributed require: the largest |x| the integer inequality can
    // carry without wrapping (see scaladoc bound). assert_true returns
    // NULL on success; the isNull filter keeps the check from being
    // pruned as an unused column.
    val bound = math.sqrt(Long.MaxValue.toDouble /
      (window.toDouble * window * math.max(4L, k.toLong * k))).toLong - 1
    val checked = df
      .withColumn("__chk", assert_true(
        col(valueCol).isNull || abs(col(valueCol)) <= lit(bound),
        lit(s"$valueCol exceeds the overflow-safe magnitude $bound for window=$window, k=$k")))
      .filter(col("__chk").isNull).drop("__chk")
    // contribution of an observation to the NEXT `window` days' baselines
    val contrib = checked
      .select(kcols :+ col(dateCol) :+ col(valueCol).as("__x") :+
        explode(sequence(lit(1), lit(window))).as("__diff"): _*)
      .select(kcols :+ date_add(col(dateCol), col("__diff")).as("__anchor") :+
        col("__x") :+ (col("__x") * col("__x")).as("__x2"): _*)
    val base = contrib
      .groupBy(kcols :+ col("__anchor"): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__x2")).as("__sx2"))
      .select(keys.map(kk => col(kk).as(s"__k_$kk")) ++
        Seq(col("__anchor"), col("__n"), col("__sx"), col("__sx2")): _*)
    df.join(base,
        keys.map(kk => col(kk) === col(s"__k_$kk")).reduce(_ && _) &&
          col(dateCol) === col("__anchor"))
      .select(kcols :+ col(dateCol) :+ col(valueCol) :+
        col("__n").as("n_baseline") :+
        ((col("__n") * col(valueCol) - col("__sx")) *
          (col("__n") * col(valueCol) - col("__sx")) >
          lit(k.toLong * k) * (col("__n") * col("__sx2") - col("__sx") * col("__sx")) &&
          col("__n") >= minN).as("is_anomaly"): _*)
  }
}
