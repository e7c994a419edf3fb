package graft.operators

import graft.SparkSpec

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def d(day: Int) = java.sql.Date.valueOf(f"2024-05-$day%02d")

  // 9 calm days (10±1) then a 100-spike, then calm again
  private def series = ((1 to 9).map(i => ("a", d(i), 10L + (i % 2))) ++
    Seq(("a", d(10), 100L), ("a", d(11), 10L))).toDF("k", "day", "x")

  private def run(df: org.apache.spark.sql.DataFrame, k: Int = 3, minN: Int = 5) =
    Anomaly.rollingZScoreFlags(df, Seq("k"), "day", "x", window = 10, k = k, minN = minN)
      .select($"day", $"n_baseline", $"is_anomaly")
      .as[(java.sql.Date, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("flags the spike against its trailing baseline, not the calm days") {
    val got = run(series)
    assert(got(d(10)) == ((9L, true)), s"spike must flag: $got")
    assert((2 to 9).forall(i => !got(d(i))._2), "calm days must not flag")
  }

  test("the spike does not poison the next day's baseline into flagging") {
    // day 11's baseline INCLUDES the 100-spike → huge variance → 10 is fine
    val got = run(series)
    assert(got(d(11)) == ((10L, false)))
  }

  test("days with fewer than minN baseline points never flag; day 1 has none") {
    val got = run(series, minN = 5)
    assert(!got.contains(d(1)))                   // no baseline at all → absent
    assert((2 to 5).forall(i => !got(d(i))._2))   // n < 5 → unflagged
    assert(got(d(5))._1 == 4L)
  }

  test("zero-variance baseline: any deviation flags, equality does not") {
    val flat = ((1 to 6).map(i => ("a", d(i), 7L)) :+ ("a", d(7), 8L) :+ ("a", d(8), 7L))
      .toDF("k", "day", "x")
    val got = run(flat, k = 3, minN = 3)
    assert(got(d(7)) == ((6L, true)))   // (6·8−42)² = 36 > 0 with σ = 0
    assert(!got(d(6))._2)               // 7 vs all-7 baseline: 0 > 0 is false
  }

  test("keys are independent and argument bounds are enforced") {
    val two = (series.as[(String, java.sql.Date, Long)].collect().toSeq ++
      (1 to 11).map(i => ("b", d(i), 5L))).toDF("k", "day", "x")
    val got = Anomaly.rollingZScoreFlags(two, Seq("k"), "day", "x", 10, 3, 5)
      .select($"k", $"is_anomaly").as[(String, Boolean)].collect()
    assert(got.filter(_._1 == "b").forall(!_._2)) // b's flat series unaffected
    assert(got.filter(_._1 == "a").exists(_._2))
    intercept[IllegalArgumentException] {
      Anomaly.rollingZScoreFlags(series, Seq("k"), "day", "x", 10, 3, minN = 1)
    }
  }

  test("values past the overflow-safe magnitude fail loudly, in-range pass") {
    // bound for window=10, k=3 is ~1e8; 2e8 would wrap the RHS product
    val hot = (1 to 11).map(i => ("a", d(i), if (i == 11) 200_000_000L else 10L))
      .toDF("k", "day", "x")
    val e = intercept[Exception] {
      Anomaly.rollingZScoreFlags(hot, Seq("k"), "day", "x", 10, 3, 5).collect()
    }
    assert(e.getMessage.contains("overflow-safe") ||
      Option(e.getCause).exists(_.getMessage.contains("overflow-safe")))
    // the same series within bounds still runs
    val ok = (1 to 11).map(i => ("a", d(i), if (i == 11) 90_000_000L else 10L))
      .toDF("k", "day", "x")
    assert(Anomaly.rollingZScoreFlags(ok, Seq("k"), "day", "x", 10, 3, 5)
      .collect().nonEmpty)
    // a NULL observation passes the guard (absent, not oversized)
    val withNull = (1 to 11)
      .map(i => ("a", d(i), if (i == 6) null else java.lang.Long.valueOf(10L + i % 2)))
      .toDF("k", "day", "x")
    assert(Anomaly.rollingZScoreFlags(withNull, Seq("k"), "day", "x", 10, 3, 5)
      .collect().nonEmpty)
  }
}
