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

  test("profile reads the input exactly once (single scan in the plan)") {
    val df = Seq((1L, "x")).toDF("id", "tag")
    val plan = Profiler.profile(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union")) // one aggregation + stack, no per-column union
  }
}
