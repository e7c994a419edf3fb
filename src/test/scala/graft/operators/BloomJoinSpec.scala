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
