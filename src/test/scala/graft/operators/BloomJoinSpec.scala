package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 1000L).map(i => (i, i % 97)).toDF("fk", "payload")
  private def dim = Seq(3L, 97L, 500L, 999L).map(k => (k, s"d$k")).toDF("dk", "name")

  test("pruneJoin returns exactly the plain inner join (FPs removed by the join)") {
    val pruned = BloomJoin.pruneJoin(fact, dim, "fk", "dk", expectedItems = 16)
      .select("fk", "payload", "name").collect().map(_.toSeq).toSet
    val plain = fact.join(dim, $"fk" === $"dk")
      .select("fk", "payload", "name").collect().map(_.toSeq).toSet
    assert(pruned == plain)
    assert(pruned.size == 4)
  }

  test("bloom sketch admits every dim key (no false negatives by construction)") {
    val bloom = BloomJoin.keyBloom(dim, "dk", expectedItems = 16)
    assert(bloom != null && bloom.length > 0)
    // every real key must survive the pruning filter
    val kept = BloomJoin.pruneJoin(fact, dim, "fk", "dk", joinType = "semi",
      expectedItems = 16).select("fk").as[Long].collect().toSet
    assert(Set(3L, 97L, 500L, 999L).subsetOf(kept))
  }

  test("fact and dim sharing the key column name joins without ambiguity") {
    // regression: bare col() refs threw AnalysisException when both sides
    // named the key identically — a documented inner-join use case
    val out = BloomJoin.pruneJoin(
      fact.withColumnRenamed("fk", "k"), dim.withColumnRenamed("dk", "k"),
      "k", "k", expectedItems = 16)
      .select("payload", "name").collect()
    assert(out.length == 4)
  }

  test("pruning filter is applied below any exchange (scan-side, pre-shuffle)") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // a Range-backed fact: a LocalRelation fixture would be constant-folded
    // by ConvertToLocalRelation and leave no FilterExec to assert on
    val rangeFact = spark.range(1, 1001)
      .select($"id".as("fk"), ($"id" % 97).as("payload"))
    val out = BloomJoin.pruneJoin(rangeFact, dim, "fk", "dk", expectedItems = 16)
    out.collect()
    // AQE wrappers (AdaptiveSparkPlanExec, QueryStageExec) are tree LEAVES
    // — plain collect() never descends into their .executedPlan/.plan, so
    // flatten through them explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val nodes = flatten(out.queryExecution.executedPlan)
    val pruneFilters = nodes.collect {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f
    }
    assert(pruneFilters.nonEmpty, "no might_contain filter in executed plan")
    // nothing shuffles beneath the pruning filter: rows are dropped at the
    // scan side, before any exchange the join introduces
    pruneFilters.foreach { f =>
      assert(flatten(f).collect { case e: ShuffleExchangeExec => e }.isEmpty)
    }
  }

  test("empty dimension yields an empty inner join, not a crash") {
    val out = BloomJoin.pruneJoin(fact, dim.filter($"dk" < 0), "fk", "dk")
    assert(out.count() == 0)
  }

  test("outer joins are rejected — pruning would drop preserved rows") {
    intercept[IllegalArgumentException] {
      BloomJoin.pruneJoin(fact, dim, "fk", "dk", joinType = "left")
    }
  }
}
