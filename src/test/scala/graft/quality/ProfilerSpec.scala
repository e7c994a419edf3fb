package graft.quality

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile computes nulls, distincts, min and max per column in long format") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None),
      (Some(2L), Some("a")), (None, Some("a"))
    ).toDF("id", "tag")
    val out = Profiler.profile(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(out("id") == ((1L, 2L, "1", "2")))
    assert(out("tag") == ((1L, 2L, "a", "b")))
  }

  test("profile survives column names containing quotes and backticks") {
    // names are interpolated into generated stack() SQL — regression for
    // injection/breakage via metacharacters in a column name
    val df = Seq((Some(1L), Some("x")), (None, Some("y")))
      .toDF("weird`col", "it's quoted")
    val out = Profiler.profile(df, Seq("weird`col", "it's quoted"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("weird`col") == 1L)
    assert(out("it's quoted") == 0L)
  }

  test("profile reads the input exactly once (single scan in the plan)") {
    val df = Seq((1L, "x")).toDF("id", "tag")
    val plan = Profiler.profile(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union")) // one aggregation + stack, no per-column union
  }
}
