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

  test("no zeroFill/ffill: pure grid completion leaves gap rows null") {
    val out = Resample.gapFill(observed, "k", "hour", expr("interval 1 hour"))
      .filter($"k" === "a").collect()
    assert(out.length == 4)
    assert(out.count(_.isNullAt(2)) == 2) // hours 2, 3 unobserved
  }
}
