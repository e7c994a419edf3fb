package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GlobalIndexSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("withGlobalIndex equals the single-task global row_number") {
    val scalable = GlobalIndex.withGlobalIndex(rows.repartition(8), "idx", col("id"))
      .select("id", "idx").as[(Long, Long)].collect().toMap
    assert(scalable == (1 to 500).map(i => i.toLong -> (i - 1).toLong).toMap)
  }

  test("indices are contiguous 0..n-1 and independent of input layout") {
    val a = GlobalIndex.withGlobalIndex(rows.repartition(3), "idx", col("id"))
      .select("id", "idx").as[(Long, Long)].collect().sorted.toSeq
    val b = GlobalIndex.withGlobalIndex(rows.repartition(11), "idx", col("id"))
      .select("id", "idx").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
    assert(a.map(_._2).sorted == (0L until 500L))
  }

  test("ordering by a hash yields a deterministic non-identity permutation") {
    val h = graft.functions.PortableHash.hash60(col("id"))
    val df = rows.select(col("id"), h.as("__h"))
    val p1 = GlobalIndex.withGlobalIndex(df, "idx", col("__h"), col("id"))
      .select("id", "idx").as[(Long, Long)].collect().toMap
    val p2 = GlobalIndex.withGlobalIndex(df.repartition(5), "idx", col("__h"), col("id"))
      .select("id", "idx").as[(Long, Long)].collect().toMap
    assert(p1 == p2)                                     // reproducible epoch shuffle
    assert(p1.values.toSeq.sorted == (0L until 500L))    // still a permutation
    assert(p1.count { case (id, idx) => idx == id - 1 } < 50) // and actually shuffled
  }

  test("indexes survive a downstream coalesce(1)") {
    // regression guard: monotonically_increasing_id is initialized from
    // its own RDD's split index, so a single-file write's coalesce must
    // not collapse the partition component (a TaskContext-based tag
    // would — see PrefixSumSpec's twin test)
    val idx = GlobalIndex.withGlobalIndex(rows.repartition(7), "idx", col("id"))
      .coalesce(1).select("id", "idx").as[(Long, Long)].collect().toMap
    assert(idx == (1L to 500L).map(i => i -> (i - 1)).toMap)
  }

  test("the plan range-partitions instead of collapsing to one task") {
    val plan = GlobalIndex.withGlobalIndex(rows.repartition(8), "idx", col("id"))
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("rangepartitioning"), s"no range partitioning in:\n$plan")
  }
}
