package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key: "a" carries 80% of rows
  private def skewed = (Seq.fill(80)("a") ++ Seq.fill(12)("b") ++ Seq.fill(8)("c"))
    .zipWithIndex.map { case (k, i) => (k, i.toDouble) }.toDF("k", "v")

  test("saltedCount equals plain groupBy count") {
    val plain = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, Seq("k"), buckets = 8, out = "count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedSumAvg equals plain sum/avg") {
    val out = Skew.saltedSumAvg(skewed, Seq("k"), "v", buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exp = skewed.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum("v"), org.apache.spark.sql.functions.avg("v"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exp.foreach { case (k, (s, a)) =>
      assert(math.abs(out(k)._1 - s) < 1e-9)
      assert(math.abs(out(k)._2 - a) < 1e-9)
    }
  }

  test("saltedJoin equals plain equi-join, including row multiplicity") {
    val dim = Seq(("a", "apple"), ("b", "berry"), ("c", "cherry"), ("d", "date"))
      .toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "name").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 4).groupBy("k", "name").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(salted == plain)
  }

  test("saltedJoin left joins keep unmatched fact rows exactly once") {
    val dim = Seq(("a", "apple")).toDF("k", "name")
    val out = Skew.saltedJoin(skewed, dim, "k", buckets = 4, joinType = "left")
    assert(out.count() == 100)
    assert(out.filter($"name".isNull).count() == 20) // b + c rows unmatched
  }

  test("AQE OptimizeSkewedJoin splits the hot partition of a sort-merge join at runtime") {
    // evidence that the DEFAULT skew path (runtime AQE splitting) really
    // fires under this engine's session shape — Skew.salted* exists only
    // for the cases AQE cannot fix (see Skew scaladoc)
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // shrink the detection thresholds so a ~100 KB hot partition counts
      // as skewed in a unit test (prod defaults are 256 MB / factor 5) —
      // skew stats are COMPRESSED shuffle-block sizes, so the pad must be
      // row-unique or LZ4 flattens the hot partition below the threshold
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      def pad(i: Int) = f"${i * 2654435761L}%016x" * 12 // 192 incompressible-ish chars
      // hot key 0 carries 5000 unique-pad rows; 50 cold keys get 20 each
      val hotSide = ((0 until 5000).map(_ => 0) ++ (1 to 50).flatMap(Seq.fill(20)(_)))
        .zipWithIndex.map { case (k, i) => (k, pad(i)) }.toDF("k", "pad")
      val uniformSide = (0 to 50).flatMap(k => Seq.fill(10)(k))
        .map(k => (k, k.toLong)).toDF("k", "v")
      val joined = hotSide.join(uniformSide, Seq("k"))
      // collect() (not count()) so THIS Dataset's own QueryExecution runs
      // and its adaptive plan finalizes — count() builds a separate one
      assert(joined.collect().length == 5000 * 10 + 50 * 20 * 10)
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: flatten(q.plan)
        case other => other +: other.children.flatMap(flatten)
      }
      val nodes = flatten(joined.queryExecution.executedPlan)
      val skewJoinFired = nodes.exists {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s.isSkewJoin
        case s: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => s.isSkewJoin
        case _ => false
      }
      assert(skewJoinFired,
        "OptimizeSkewedJoin did not mark the join as skew — AQE skew splitting is not active:\n" +
          joined.queryExecution.executedPlan.toString.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
