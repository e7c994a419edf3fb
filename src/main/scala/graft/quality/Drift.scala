package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-distribution drift report — the check a training pipeline runs
  * after carving train/val/test: a hash split is only unbiased if every
  * feature's distribution is (near-)identical across splits, and a skewed
  * split silently invalidates eval numbers. This compares per-split
  * normalized histograms of any bucketed feature and emits the per-bucket
  * total-variation contribution between two chosen splits (TV distance =
  * ½ Σ_buckets |p − q|; the factor stays with the caller so each row
  * remains an exact integer).
  *
  * Scale shape: one (split, bucket) hash aggregation over the raw rows
  * (map-side combinable), split totals re-entering as a BROADCAST of
  * |splits| rows — never a window over the split partition, which would
  * funnel the whole dataset through |splits| reducers — then a bucket-level
  * conditional aggregation. Bucket cardinality is the output size;
  * everything heavy is the first aggregation.
  *
  * Determinism: fractions are quantized to integer micro-units per
  * (split, bucket) — exact integer counts, one IEEE division each — and
  * the TV contribution is an integer |difference|.
  */
object Drift {

  /** Per-bucket normalized histogram across `splits`, plus the
    * total-variation contribution `tv_e6 = |frac_<s0> − frac_<s1>|` for
    * the first two splits. Buckets a split never hits contribute 0.
    * Output: (bucketCol, frac_<s>_e6 per split, tv_e6).
    */
  def splitHistogram(df: DataFrame, splitCol: String, bucketCol: String,
      splits: Seq[String]): DataFrame = {
    require(splits.size >= 2, "need at least two splits to compare")
    val counts = df.groupBy(col(splitCol), col(bucketCol))
      .agg(count(lit(1)).as("__n"))
    val totals = counts.groupBy(col(splitCol)).agg(sum(col("__n")).as("__tot"))
    val frac = counts.join(broadcast(totals), splitCol)
      .withColumn("__frac_e6",
        floor(col("__n") * lit(1.0) / col("__tot") * lit(1e6) + lit(0.5))
          .cast("long"))
    val aggs = splits.map(s =>
      sum(when(col(splitCol) === s, col("__frac_e6")).otherwise(lit(0L)))
        .as(s"frac_${s}_e6"))
    frac.groupBy(col(bucketCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("tv_e6",
        abs(col(s"frac_${splits(0)}_e6") - col(s"frac_${splits(1)}_e6")))
  }
}
