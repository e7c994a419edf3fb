package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-grouped batch assignment — group sequences of similar length
  * into the same fixed-size batch so padding waste stays bounded by the
  * bucket width (the standard dynamic-batching trick in training input
  * pipelines), deterministically and at scale.
  *
  * Every document gets (bucket, batch_in_bucket, pos_in_batch): bucket =
  * length ÷ bucketWidth, and within each bucket documents are numbered
  * 0..n−1 in id order, then cut into batches of `batchSize`.
  *
  * Scale shape, same construction as [[Mixture]]: the within-bucket
  * sequence number is a [[GlobalIndex]] over (bucket, id) minus the
  * bucket's first index, which is just the prefix sum of per-bucket row
  * counts (a map-side-combined aggregate over the raw input, broadcast
  * back — |buckets| rows). NO per-bucket window: at 100 TB a single
  * length bucket holds billions of rows and `Window.partitionBy(bucket)`
  * would funnel each one through one task. */
object Batching {

  /** Append `bucket`, `batch_in_bucket`, `pos_in_batch` to `df`. `id`
    * must be unique; `length` must be a non-negative integral column. */
  def lengthGrouped(df: DataFrame, id: String, length: Column,
      bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0, "bucketWidth and batchSize must be positive")
    // floor(x / w) == x div w for the non-negative lengths required here
    val bucketed = df.withColumn("bucket",
      floor(length.cast("long") / lit(bucketWidth.toLong)).cast("long"))
    val indexed = GlobalIndex.withGlobalIndex(bucketed, "__bidx", col("bucket"), col(id))
    val bases = bucketed.groupBy(col("bucket").as("__bb")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__base",
        coalesce(
          sum(col("__cnt")).over(Window.orderBy(col("__bb"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bb"), col("__base"))
    indexed.join(broadcast(bases), col("bucket") === col("__bb"))
      .withColumn("__k", col("__bidx") - col("__base"))
      .withColumn("batch_in_bucket", expr(s"__k div ${batchSize}L"))
      .withColumn("pos_in_batch", (col("__k") % batchSize).cast("int"))
      .drop("__bb", "__base", "__bidx", "__k")
  }
}
