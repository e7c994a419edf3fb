package graft.io

import graft.functions.expressions.ZOrder
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Multi-dimensional data clustering for scan pruning — the layout lever
  * that partitionBy can't pull: `partitionBy` serves low-cardinality,
  * always-filtered columns with directory pruning, while Z-ordering serves
  * HIGH-cardinality numeric/temporal dimensions by making parquet
  * row-group and file min/max statistics selective on BOTH dimensions of a
  * two-column sort, instead of only the leading one.
  */
object Layout {

  /** Map a numeric column to integer bucket ids 0 .. 2^bits−1 over the
    * known [min, max] value range (out-of-range values clamp). 15 bits per
    * dimension is plenty: pruning granularity only needs to out-resolve
    * the row-group count, not the value space. */
  def bucketize(c: Column, min: Double, max: Double, bits: Int = 15): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    require(max > min, s"max must exceed min, got [$min, $max]")
    val n = (1L << bits) - 1
    least(lit(n), greatest(lit(0L),
      floor((c.cast("double") - lit(min)) / lit(max - min) * n))).cast("long")
  }

  /** The Morton code of two bucketized dimensions (see [[ZOrder]]). */
  def zorder(a: Column, b: Column): Column = ZOrder.zorder(a, b)

  /** Z-order-clustered parquet write: range-partition on the Morton code
    * of the two bucketized dimensions (each output file covers a tight
    * curve segment), sort within partitions, write. Filters on EITHER
    * dimension then skip most files/row-groups via footer stats.
    * `numFiles = 0` keeps the session's shuffle parallelism. */
  def zorderedParquet(df: DataFrame, path: String,
      a: (String, Double, Double), b: (String, Double, Double),
      bits: Int = 15, numFiles: Int = 0): Unit = {
    val z = zorder(
      bucketize(col(a._1), a._2, a._3, bits),
      bucketize(col(b._1), b._2, b._3, bits))
    val withZ = df.withColumn("__z", z)
    val ranged =
      if (numFiles > 0) withZ.repartitionByRange(numFiles, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions("__z").drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Compact a directory of many small parquet files into `numFiles`
    * larger ones — the small-file pathology killer: every file costs a
    * scheduler task, an open, and a footer read, so a 100 TB table written
    * by thousands of streaming micro-batches can spend more time on
    * metadata than data. `coalesce` (not `repartition`) merges without a
    * shuffle; the rewrite goes to a tmp directory and swaps in, so the
    * lazy read never consumes files the write just deleted. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val tmp = dir + ".compact-tmp"
    spark.read.parquet(dir).coalesce(numFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(dir))
    ()
  }
}
