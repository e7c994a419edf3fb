package graft.operators

import graft.functions.{PortableHash, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Importance weighting for data selection — the DSIR recipe (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling", NeurIPS
  * 2023): estimate target and raw data distributions over HASHED n-gram
  * features (here unigrams → `buckets` buckets), weight every raw document
  * by its log importance ratio Σ_tokens ln(p_target(b)/p_raw(b)), then
  * select by weight. Documents that look like the target corpus get
  * positive weights; off-distribution documents go negative.
  *
  * Both distributions are add-one smoothed over the bucket space, so the
  * ratio is defined for every bucket. Each bucket's log-ratio is quantized
  * to integer micro-units BEFORE the per-document sum — document weights
  * are integer sums, order-independent and engine-portable (same
  * discipline as [[LangModel]]).
  *
  * Scale shape: the feature "model" is two hash aggregations collapsing
  * each corpus to at most `buckets` rows — the whole point of DSIR's
  * hashing trick is that the model size is a constant, so the per-bucket
  * stats table (a few KB) BROADCASTS to the scoring join; the raw corpus
  * is never shuffled on a key at all. Scoring pre-aggregates each document
  * to (doc, bucket, tf) — fan-out bounded by min(tokens, buckets) per doc
  * — then one broadcast join + one aggregation back to the document.
  * Token totals derive from the bucket tables themselves via a global
  * window over the `buckets`-row stats frame (256 rows on one partition —
  * constant), NOT a second corpus scan.
  */
object Importance {

  /** (idCol, __b) — one row per token occurrence, bucketed by the portable
    * 60-bit hash of the token. */
  private def bucketTokens(df: DataFrame, idCol: String, textCol: String, buckets: Int): DataFrame =
    df.select(col(idCol), explode(Text.tokens(col(textCol))).as("__term"))
      .select(col(idCol), (PortableHash.hash60(col("__term")) % buckets).as("__b"))

  /** Per-bucket quantized log importance ratios:
    * (__b, lr_e6) for every bucket 0..buckets-1. Exposed for reuse as a
    * trained "model" (compute once on a sample, apply to the full corpus). */
  def bucketLogRatios(target: DataFrame, raw: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val spark = raw.sparkSession
    val tgtCounts = bucketTokens(target, idCol, textCol, buckets)
      .groupBy("__b").agg(count(lit(1)).as("__ct"))
    val rawCounts = bucketTokens(raw, idCol, textCol, buckets)
      .groupBy("__b").agg(count(lit(1)).as("__cr"))
    val spine = spark.range(buckets).select(col("id").as("__b"))
    val wAll = Window.partitionBy(lit(1))
    val b = lit(buckets.toDouble)
    spine
      .join(tgtCounts, Seq("__b"), "left")
      .join(rawCounts, Seq("__b"), "left")
      .withColumn("__ct", coalesce(col("__ct"), lit(0L)))
      .withColumn("__cr", coalesce(col("__cr"), lit(0L)))
      .withColumn("__ctt", sum(col("__ct")).over(wAll))
      .withColumn("__crt", sum(col("__cr")).over(wAll))
      .withColumn("lr_e6",
        floor(log(((col("__ct") + lit(1.0)) / (col("__cr") + lit(1.0)))
            * ((col("__crt").cast("double") + b) / (col("__ctt").cast("double") + b)))
          * lit(1e6) + lit(0.5)).cast("long"))
      .select(col("__b"), col("lr_e6"))
  }

  /** Score every row of `docs` by its DSIR log importance weight under the
    * (target, raw) bucket model.
    *
    * Output: (idCol, n_tokens, logratio_e6, avg_logratio_e6). Positive =
    * target-like; a resampling stage keeps the top mass by weight (e.g.
    * [[Sampling.quotaSample]] keyed on the weight, or a threshold). */
  def dsirWeights(target: DataFrame, raw: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, buckets: Int): DataFrame = {
    val stats = bucketLogRatios(target, raw, idCol, textCol, buckets)
    val docBuckets = Partitions.widen(bucketTokens(docs, idCol, textCol, buckets), col(idCol))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__tf"))
    val agg = docBuckets
      .join(broadcast(stats), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"),
        sum(col("__tf") * col("lr_e6")).as("logratio_e6"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("logratio_e6"), lit(0L)).as("logratio_e6"))
      .withColumn("avg_logratio_e6",
        when(col("n_tokens") === 0, 0L)
          .otherwise(floor(col("logratio_e6").cast("double") / col("n_tokens").cast("double")
            + lit(0.5)).cast("long")))
  }
}
