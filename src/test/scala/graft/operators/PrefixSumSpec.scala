package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class PrefixSumSpec extends SparkSpec {

  private def frame(vals: Seq[(Long, Long)], parts: Int) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map { case (id, v) => Row(id, v) }, parts),
      StructType(Seq(StructField("id", LongType), StructField("v", LongType))))

  test("matches the single-task window running sum exactly") {
    val vals = (1L to 300L).map(i => i -> (i * 7 % 23))
    val got = PrefixSum.runningTotal(frame(vals, 7), "cum", col("v"), col("v").desc, col("id").asc)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = vals.sortBy { case (id, v) => (-v, id) }
      .scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }.drop(1).toMap
    assert(got == ref)
  }

  test("negative deltas (sweep-line shape) accumulate correctly") {
    val vals = (1L to 100L).map(i => i -> (if (i % 2 == 0) -3L else 5L))
    val got = PrefixSum.runningTotal(frame(vals, 5), "cum", col("v"), col("id").asc)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    val ref = (1L to 100L).map { i => acc += (if (i % 2 == 0) -3L else 5L); i -> acc }.toMap
    assert(got == ref)
  }

  test("result is independent of input partitioning") {
    val vals = (1L to 123L).map(i => i -> (i % 11))
    def run(parts: Int) =
      PrefixSum.runningTotal(frame(vals, parts), "cum", col("v"), col("id").asc)
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(17))
  }

  test("running total survives a downstream coalesce(1)") {
    // regression: a TaskContext-based partition tag reports pid 0 for
    // every pre-coalesce partition when a single-file write coalesces
    // the stage (Verify does exactly that), zeroing all offsets
    val vals = (1L to 200L).map(i => i -> (i % 13))
    val got = PrefixSum.runningTotal(frame(vals, 9), "cum", col("v"), col("id").asc)
      .coalesce(1).select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    val ref = (1L to 200L).map { i => acc += i % 13; i -> acc }.toMap
    assert(got == ref)
  }

  test("grouped running total matches the per-group window, groups spanning partitions") {
    // 3 groups × 80 rows over 4 shuffle partitions forces every group
    // across partition boundaries
    val rows = for (g <- Seq("a", "b", "c"); i <- 1L to 80L)
      yield Row(g.hashCode * 1000L + i, g, i % 17)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 7),
      StructType(Seq(StructField("id", LongType), StructField("g", StringType),
        StructField("v", LongType))))
    val got = PrefixSum.runningTotalByGroup(df, "cum", col("v"), col("g"),
        col("id").asc)
      .coalesce(1).select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = (for (g <- Seq("a", "b", "c")) yield {
      var acc = 0L
      (1L to 80L).map { i => acc += i % 17; (g.hashCode * 1000L + i) -> acc }
    }).flatten.toMap
    assert(got == ref)
  }

  test("runningTotals: k cumulatives in one scan match k single-scan calls") {
    val vals = (1L to 250L).map(i => i -> (i * 11 % 17))
    val df = frame(vals, 6).withColumn("w", col("v") * 2 - 9)
    val multi = PrefixSum.runningTotals(df,
        Seq("cv" -> col("v"), "cw" -> col("w")), col("id").asc)
      .select("id", "cv", "cw").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val single = {
      val a = PrefixSum.runningTotal(df, "cv", col("v"), col("id").asc)
      PrefixSum.runningTotal(a, "cw", col("w"), col("id").asc)
        .select("id", "cv", "cw").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    assert(multi == single)
    assert(multi.size == 250)
  }

  test("null values count as zero") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, java.lang.Long.valueOf(10L)), Row(2L, null), Row(3L, java.lang.Long.valueOf(5L)))),
      StructType(Seq(StructField("id", LongType), StructField("v", LongType, nullable = true))))
    val got = PrefixSum.runningTotal(df, "cum", col("v"), col("id").asc)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 10L, 3L -> 15L))
  }
}
