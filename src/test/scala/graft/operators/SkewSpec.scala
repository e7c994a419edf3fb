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
}
