package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def h(n: Int) = new Timestamp(n * 3600000L)

  // key "a": observations at hours 1 and 4 (gap at 2, 3); key "b": one row
  private def observed = Seq(
    ("a", h(1), 2L, 100L),
    ("a", h(4), 1L, 70L),
    ("b", h(9), 5L, 9L)
  ).toDF("k", "hour", "n", "v")

  test("gapFill completes each key's grid, zero-fills counters, forward-fills values") {
    val out = Resample.gapFill(observed, "k", "hour", expr("interval 1 hour"),
        zeroFill = Map("n" -> lit(0L)), ffill = Seq("v"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L,
        r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      ("a", 1L, 2L, 100L),
      ("a", 2L, 0L, 100L), // gap: counter zeroed, value carried
      ("a", 3L, 0L, 100L),
      ("a", 4L, 1L, 70L),  // new observation replaces the carry
      ("b", 9L, 5L, 9L)))  // single-bucket key: spine is itself
  }

  test("gapFill result is invariant under input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Resample.gapFill(df, "k", "hour", expr("interval 1 hour"),
          zeroFill = Map("n" -> lit(0L)), ffill = Seq("v"))
        .collect().map(_.toSeq).toSet
    assert(run(observed) == run(observed.repartition(7)))
  }

  test("bfill patches the leading gap after ffill (pandas ffill().bfill() composition)") {
    // key "c": first observation NOT at its min bucket — build that by
    // giving it rows at hours 5 (null v) and 7 (v=50): after the grid is
    // complete, hours 5 and 6 have no carry source for ffill
    val withLeadingGap = observed.union(Seq(
      ("c", h(5), 1L, null.asInstanceOf[java.lang.Long]),
      ("c", h(7), 1L, java.lang.Long.valueOf(50L))
    ).toDF("k", "hour", "n", "v"))
    val out = Resample.gapFill(withLeadingGap, "k", "hour", expr("interval 1 hour"),
        zeroFill = Map("n" -> lit(0L)), ffill = Seq("v"), bfill = Seq("v"))
      .filter($"k" === "c")
      .collect().map(r => r.getTimestamp(1).getTime / 3600000L -> r.getLong(3)).toMap
    // hours 5, 6 have nothing before them → backward carry from hour 7
    assert(out == Map(5L -> 50L, 6L -> 50L, 7L -> 50L))
  }

  test("gapFill fails loudly on an observation off the min-anchored step grid") {
    // a :30 observation under a 1-hour step sits on no spine bucket — it
    // must raise (naming key and bucket), never silently vanish
    val offGrid = observed.union(Seq(
      ("a", new Timestamp(2 * 3600000L + 1800000L), 1L, 5L)
    ).toDF("k", "hour", "n", "v"))
    val e = intercept[Exception] {
      Resample.gapFill(offGrid, "k", "hour", expr("interval 1 hour"),
        zeroFill = Map("n" -> lit(0L)), ffill = Seq("v")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("off the min-anchored step grid")),
      s"expected the grid-alignment error, got: $e")
  }

  test("interpolate fills gaps linearly in integer arithmetic; edges stay null") {
    // key "a": v 100@h1 → 70@h4. Slope −10/hour: h2 → 90, h3 → 80
    val out = Resample.interpolate(
        observed.select($"k", $"hour", $"v"), "k", "hour", expr("interval 1 hour"), "v")
      .filter($"k" === "a")
      .collect().map(r => r.getTimestamp(1).getTime / 3600000L -> r.getLong(2)).toMap
    assert(out == Map(1L -> 100L, 2L -> 90L, 3L -> 80L, 4L -> 70L))
    // non-exact NEGATIVE slope locks the division semantics: 100@h1 →
    // 90@h4 is −10/3 per hour; truncation (Spark div ≡ DuckDB //) gives
    // h2 = 100 + trunc(−3.33) = 97, h3 = 100 + trunc(−6.67) = 94
    // (floor semantics would give 96 and 93)
    val decl = Seq(("d", h(1), 100L), ("d", h(4), 90L)).toDF("k", "hour", "v")
    val out2 = Resample.interpolate(decl, "k", "hour", expr("interval 1 hour"), "v")
      .collect().map(r => r.getTimestamp(1).getTime / 3600000L -> r.getLong(2)).toMap
    assert(out2 == Map(1L -> 100L, 2L -> 97L, 3L -> 94L, 4L -> 90L))
    // leading gap: key "c" with null-valued first bucket has no left anchor
    val lead = Seq(
      ("c", h(5), null.asInstanceOf[java.lang.Long]),
      ("c", h(7), java.lang.Long.valueOf(50L))
    ).toDF("k", "hour", "v")
    val edges = Resample.interpolate(lead, "k", "hour", expr("interval 1 hour"), "v")
      .collect().map(r => r.getTimestamp(1).getTime / 3600000L ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(edges == Map(5L -> None, 6L -> None, 7L -> Some(50L)))
  }

  test("interpolate rejects non-integral value columns (exactness contract)") {
    val floats = Seq(("a", h(1), 1.5), ("a", h(3), 2.5)).toDF("k", "hour", "v")
    val e = intercept[IllegalArgumentException] {
      Resample.interpolate(floats, "k", "hour", expr("interval 1 hour"), "v")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("no zeroFill/ffill: pure grid completion leaves gap rows null") {
    val out = Resample.gapFill(observed, "k", "hour", expr("interval 1 hour"))
      .filter($"k" === "a").collect()
    assert(out.length == 4)
    assert(out.count(_.isNullAt(2)) == 2) // hours 2, 3 unobserved
  }

  private def d(day: Int) = java.sql.Date.valueOf(f"2024-01-$day%02d")

  test("ewmaHalving matches the hand-computed dyadic average") {
    val daily = Seq(("a", d(1), 10L), ("a", d(2), 20L), ("a", d(3), 40L))
      .toDF("k", "day", "x")
    val got = Resample.ewmaHalving(daily, Seq("k"), "day", "x", window = 2)
      .select($"day", $"ewma_e6").as[(java.sql.Date, Long)].collect().toMap
    // window 2 → weights newest=2, prev=1
    assert(got(d(1)) == 10000000L)                              // 10·2/2
    assert(got(d(2)) == math.floor((20.0 * 2 + 10) / 3 * 1e6 + 0.5).toLong)
    assert(got(d(3)) == math.floor((40.0 * 2 + 20) / 3 * 1e6 + 0.5).toLong)
  }

  test("ewmaHalving: observations older than the window do not contribute") {
    val daily = Seq(("a", d(1), 1000L), ("a", d(12), 8L)).toDF("k", "day", "x")
    val got = Resample.ewmaHalving(daily, Seq("k"), "day", "x", window = 10)
      .select($"day", $"ewma_e6").as[(java.sql.Date, Long)].collect().toMap
    // d(12) is 11 days after d(1) — outside the 10-day horizon entirely
    assert(got(d(12)) == 8000000L)
    assert(got(d(1)) == 1000000000L)
  }

  test("ewmaPartials merge law: disjoint slices re-sum to the full state") {
    val daily = (1 to 14).map(i => ("k", d(i), i * 3L)).toDF("k", "day", "x")
    val full = Resample.ewmaPartials(daily, Seq("k"), "day", "x", window = 4)
      .as[(String, java.sql.Date, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // split mid-window: batch 1 = days 1-7, batch 2 = days 8-14
    val b1 = Resample.ewmaPartials(daily.where($"day" <= d(7)), Seq("k"), "day", "x", 4)
    val b2 = Resample.ewmaPartials(daily.where($"day" > d(7)), Seq("k"), "day", "x", 4)
    val merged = b1.unionByName(b2)
      .groupBy($"k", $"__anchor")
      .agg(sum($"__num").as("__num"), sum($"__den").as("__den"))
      .as[(String, java.sql.Date, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(merged == full) // incremental maintenance ≡ full recompute
  }

  test("ewmaHalving: gaps shift weights; keys independent; observed dates only") {
    val daily = Seq(("a", d(1), 4L), ("a", d(3), 8L), ("b", d(3), 100L))
      .toDF("k", "day", "x")
    val out = Resample.ewmaHalving(daily, Seq("k"), "day", "x", window = 3)
      .select($"k", $"day", $"ewma_e6").as[(String, java.sql.Date, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out.size == 3) // no rows for unobserved d(2)
    // at a/d3: newest weight 4 on x=8, diff=2 weight 1 on x=4 → 36/5
    assert(out(("a", d(3))) == math.floor(36.0 / 5 * 1e6 + 0.5).toLong)
    assert(out(("b", d(3))) == 100000000L) // b unaffected by a's history
  }
}
