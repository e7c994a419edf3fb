package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}

/** Plan audits for registered queries whose VALUE is a physical-plan
  * property (the result itself is oracle-checked by the driver gate). */
class SparkEntryPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // AQE wrappers are tree leaves — descend through them explicitly
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("parts_filter: predicate reaches the parquet scan and columns are pruned") {
    val df = SparkEntry.queries("parts_filter")(spark, dir)
    val scans = flatten(df.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected a parquet file scan")
    val s = scans.head
    assert(s.metadata.get("PushedFilters").exists(f => f != "[]" && f.nonEmpty),
      s"filter not pushed to the scan: ${s.metadata.get("PushedFilters")}")
    // projection pruning: the scan must NOT read the full part schema
    assert(s.requiredSchema.fields.length < Tables.part(spark, dir).schema.fields.length,
      s"scan reads all columns: ${s.requiredSchema.fieldNames.mkString(",")}")
  }

  test("enrich_events: both dimension joins broadcast (no fact shuffle for the join)") {
    val df = SparkEntry.queries("enrich_events")(spark, dir)
    assert(df.collect().nonEmpty)
    val nodes = flatten(df.queryExecution.executedPlan)
    val broadcasts = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(broadcasts >= 2,
      s"expected the customer and nation joins to broadcast, saw $broadcasts")
  }

  test("q5_region_revenue: six-table join broadcasts tiny dims, never a cartesian") {
    val df = SparkEntry.queries("q5_region_revenue")(spark, dir)
    assert(df.collect().nonEmpty) // AQE finalizes the plan on execution
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "join reordering degraded to a cartesian product")
    // nation and region (25/5 rows at ANY scale) must come in as broadcasts
    val broadcasts = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(broadcasts >= 2, s"expected ≥2 broadcast joins (nation, region), saw $broadcasts")
  }
}
