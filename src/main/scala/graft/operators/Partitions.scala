package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism repair for compute-heavy operators.
  *
  * A parquet file is splittable only at row-group boundaries; a small
  * single-row-group file scans as ONE task no matter how many cores exist.
  * For cheap scans that's irrelevant, but feeding a single-task scan into
  * per-row-expensive work (shingling, hashing, vector math) serializes the
  * whole operator on one core.
  *
  * [[widen]] repartitions only when the scan's parallelism is well below
  * the cluster's — so at real scale (thousands of splits) it is a no-op
  * and adds no shuffle, while small/dev inputs fan out across the
  * executors before the expensive stage.
  */
object Partitions {

  def widen(df: DataFrame, key: Column): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    // planning-only: builds the physical plan, runs no job
    val current = df.rdd.getNumPartitions
    if (current * 2 < target) df.repartition(target, key) else df
  }
}
