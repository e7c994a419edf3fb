package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LocalRelation, LogicalPlan, Range, Repartition, RepartitionByExpression}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
    // metadata-only estimate from the ANALYZED plan — no physical planning
    // (an `df.rdd` probe would compile the whole physical plan twice)
    val current = estimateParallelism(df.sparkSession, df.queryExecution.analyzed, target)
    if (current * 2 < target) df.repartition(target, key) else df
  }

  /** Conservative parallelism estimate for a logical plan, from driver-side
    * metadata only. File scans use Spark's own bin-packing formula
    * (`FilePartition.maxSplitBytes`): splits ≈ (bytes + files·openCost) /
    * min(maxPartitionBytes, max(openCost, total/defaultParallelism)).
    * Explicit `Repartition`/`coalesce` nodes win over whatever is below
    * them. Unknown leaves estimate as `target` — i.e. "already parallel" —
    * so a wrong guess can only SKIP the repair shuffle, never add one at
    * scale. */
  private def estimateParallelism(spark: org.apache.spark.sql.SparkSession,
                                  plan: LogicalPlan, target: Int): Long = plan match {
    case r: Repartition => r.numPartitions.toLong
    case r: RepartitionByExpression =>
      r.optNumPartitions.map(_.toLong)
        .getOrElse(spark.sessionState.conf.numShufflePartitions.toLong)
    case l: LogicalRelation =>
      l.relation match {
        case fs: HadoopFsRelation =>
          val conf = spark.sessionState.conf
          val openCost = conf.filesOpenCostInBytes
          val nFiles = math.max(1L, fs.location.inputFiles.length.toLong)
          val totalCost = math.max(0L, fs.location.sizeInBytes) + nFiles * openCost
          val maxSplit = math.min(
            conf.filesMaxPartitionBytes,
            math.max(openCost, totalCost / math.max(1, target)))
          math.max(1L, totalCost / math.max(1L, maxSplit))
        case _ => target.toLong
      }
    case l: LocalRelation => math.min(math.max(1, l.data.length), target).toLong
    case r: Range => r.numSlices.map(_.toLong).getOrElse(target.toLong)
    case _: LeafNode => target.toLong
    case _ if plan.children.isEmpty => target.toLong
    // pass-through/join nodes: the narrowest input bounds the parallelism
    case _ => plan.children.map(estimateParallelism(spark, _, target)).min
  }
}
