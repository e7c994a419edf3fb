package graft.plans

import graft.SparkSpec
import graft.functions.expressions.{DotProduct, RollingHash}
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("install registers rolling_hash and dot_product as SQL functions") {
    val s = spark.newSession()
    GraftExtensions.install(s)

    val h = s.sql("SELECT rolling_hash('hello world') AS h").collect().head.getLong(0)
    assert(h == RollingHash.hashBytes("hello world".getBytes("UTF-8")))

    val d = s.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d == 32.0)

    // generator function in the LATERAL VIEW / SELECT-generator position
    val w = s.sql(
      "SELECT pos, gram FROM (SELECT window_grams(array('a','b','c','d'), 3) AS (pos, gram))")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w == Set((0L, "a b c"), (1L, "b c d")))
  }

  test("install registers the vector/byte/layout kernels as SQL functions") {
    val s = spark.newSession()
    GraftExtensions.install(s)

    val l2 = s.sql(
      "SELECT l2_squared(array(1.0d, 2.0d), array(4.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(l2 == 25.0) // 3² + 4²

    val hist = s.sql(
      "SELECT byte_histogram(CAST('aab' AS BINARY), 256) AS h")
      .collect().head.getSeq[Double](0)
    assert(hist('a'.toInt) == 2.0 / 3 && hist('b'.toInt) == 1.0 / 3)
    assert(math.abs(hist.sum - 1.0) < 1e-9) // normalized fractions

    // bit-interleave: z_order(0b11, 0b00) spreads x's bits to even slots
    val z = s.sql("SELECT z_order(CAST(3 AS BIGINT), CAST(0 AS BIGINT)) AS z")
      .collect().head.getLong(0)
    assert(z == 5L) // 0b0101
  }

  test("approx-distinct rewrite: off by default (exact), sketch plan + bounded error when enabled") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    import s.implicits._
    val df = (1 to 3000).map(i => (s"g${i % 3}", i % 500)).toDF("g", "v")

    def planOf(q: org.apache.spark.sql.DataFrame) =
      q.queryExecution.optimizedPlan.toString.toLowerCase

    // default: flag unset → exact count-distinct, no sketch in the plan
    val exactQ = df.groupBy("g").agg(countDistinct("v").as("nd"))
    assert(!planOf(exactQ).contains("hll"))
    val exact = exactQ.as[(String, Long)].collect().toMap
    assert(exact.values.forall(_ == 500))

    s.conf.set("graft.approxDistinct.enabled", "true")
    try {
      val approxQ = df.groupBy("g").agg(countDistinct("v").as("nd"))
      assert(planOf(approxQ).contains("hll_sketch"), planOf(approxQ))
      val approx = approxQ.as[(String, Long)].collect().toMap
      exact.foreach { case (g, n) =>
        assert(math.abs(approx(g) - n).toDouble / n < 0.1, s"$g: ${approx(g)} vs $n")
      }
      // guarded scope: a FILTER clause keeps exact semantics
      val filtered = df.groupBy("g")
        .agg(expr("count(DISTINCT v) FILTER (WHERE v < 100)").as("nd"))
      assert(!planOf(filtered).contains("hll_sketch"))
      assert(filtered.as[(String, Long)].collect().toMap.values.forall(_ == 100))
    } finally s.conf.set("graft.approxDistinct.enabled", "false")
  }

  test("SQL form matches the Column API form") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    import s.implicits._
    Seq("a", "xyz", "").toDF("t").createOrReplaceTempView("tv")
    val viaSql = s.sql("SELECT rolling_hash(t) FROM tv").as[Long].collect().toSeq
    val viaCol = Seq("a", "xyz", "").toDF("t")
      .select(graft.functions.Text.fingerprint(col("t"))).as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("dot_product handles empty arrays and mismatched use is type-checked") {
    import spark.implicits._
    val df = Seq(
      (Seq.empty[Double], Seq.empty[Double]),
      (Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val out = df.select(DotProduct(col("a"), col("b")).as("d")).as[Double].collect()
    assert(out.toSeq == Seq(0.0, 11.0))
    // wrong input type → analysis-time failure, not runtime garbage
    val bad = Seq((1, 2)).toDF("a", "b")
    intercept[Exception](bad.select(DotProduct(col("a"), col("b"))).collect())
  }
}
