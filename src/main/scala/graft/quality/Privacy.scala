package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Privacy-audit and privacy-preserving release operators — the screens a
  * pipeline runs before training data or aggregate dashboards leave the
  * trust boundary (complements [[graft.functions.Text.redact]]'s PII
  * scrubbing: redaction cleans rows, these govern what GROUPS reveal).
  *
  * Both operators are single-aggregation-pass shapes: one hash groupBy on
  * the quasi-identifier/group key, map-side combinable, no joins — they
  * cost the same as the `count(*)` a dashboard would run anyway.
  */
object Privacy {

  /** k-anonymity audit (Sweeney 2002): group by the quasi-identifier
    * columns and flag every equivalence class smaller than `k` — rows in
    * those classes are re-identifiable by joining the quasi-identifiers
    * against an external dataset. Output: quasi cols + (group_n, at_risk),
    * one row per class, so the caller can both count exposure and decide
    * suppression/generalization per class.
    */
  def kAnonymityRisk(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, "k < 2 makes every class trivially anonymous")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", col("group_n") < k)
  }

  /** ε-differentially-private noisy counts via the Laplace mechanism
    * (Dwork et al. 2006): per group, `count + Laplace(1/ε)` — a count
    * query has L1 sensitivity 1, so scale b = 1/ε gives ε-DP.
    *
    * The noise draw is SEEDED AND DETERMINISTIC: the uniform variate comes
    * from [[PortableHash]] of the group key (`u = h/2^60 − ½`), pushed
    * through the Laplace inverse CDF `−b·sgn(u)·ln(1−2|u|)`. That makes
    * releases reproducible run-to-run and lets the CORRECTNESS oracle
    * mirror the draw exactly — change `seed` to re-randomize. (A key-seeded
    * draw means repeated release of the SAME key adds no fresh privacy
    * budget, but correlated noise across releases — the standard trade of
    * deterministic DP pipelines; rotate `seed` per release period.)
    *
    * The single ln() per group is quantized to integer micro-units
    * immediately (same discipline as the quantized-idf operators), so the
    * released `noisy_n_e6 = n·1e6 + noise_e6` is an exact integer.
    * `h` is clamped to ≥ 1: h = 0 would put u at exactly −½ where the
    * inverse CDF's ln(0) diverges.
    */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String], eps: Double,
      seed: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(eps > 0.0, "epsilon must be positive")
    val b = 1.0 / eps
    // \u0001-delimited key with an explicit \u0002 null marker: the
    // delimiter keeps ('ab','c') and ('a','bc') distinct, and the
    // marker keeps (NULL,'a') and ('a',NULL) distinct — concat_ws
    // SKIPS nulls, so without it those groups would draw IDENTICAL
    // Laplace noise (correlated noise weakens the DP release)
    val keyStr = concat_ws("",
      groupCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val h = greatest(PortableHash.hash60(keyStr, seed), lit(1L))
    val u = h / lit(1152921504606846976.0) - lit(0.5) // h / 2^60 − ½
    val noiseE6 = floor(lit(-1.0) * lit(b) * signum(u)
      * log(lit(1.0) - lit(2.0) * abs(u)) * lit(1e6) + lit(0.5)).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_n_e6", col("n") * lit(1000000L) + noiseE6)
  }
}
