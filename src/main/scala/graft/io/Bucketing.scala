package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support — the co-located-join path for fact⋈fact joins
  * that are too big to broadcast and too frequent to re-shuffle.
  *
  * Writing both sides bucketed by the join key into the same bucket count
  * lets every subsequent equi-join on that key run with ZERO exchange:
  * each task reads bucket i of both tables. At 100 TB this converts the
  * recurring shuffle (the dominant cost of repeated large joins) into a
  * one-time write cost.
  *
  * Uses the session catalog (`saveAsTable` — bucket metadata lives in the
  * metastore; plain files can't carry it).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (overwrite). */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planner elides
    * both exchanges (verify with hasShuffle == false). */
  def joinBucketed(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** True if the executed plan contains a shuffle exchange — the property
    * bucketed joins exist to eliminate. */
  def hasShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    plan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case _ => false
    }
  }
}
