package graft.operators

import graft.SparkSpec

class GroupTopSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    ("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c"),
    ("g2", "z"),
    ("g3", null), ("g3", null)
  ).toDF("g", "v")

  test("mode picks most frequent value") {
    val out = GroupTop.mode(events.filter($"g" === "g2"), Seq("g"), "v", "m").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == Set(("g2", "z")))
  }

  test("mode breaks count ties by smallest value") {
    // g1: a=2, b=2, c=1 → tie a/b → "a"
    val out = GroupTop.mode(events, Seq("g"), "v", "m")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("g1") == "a")
  }

  test("mode drops all-null groups (caller rejoins for pandas parity)") {
    val out = GroupTop.mode(events, Seq("g"), "v", "m").collect()
    assert(!out.map(_.getString(0)).contains("g3"))
  }

  test("topK returns rank-ordered array (count desc, value asc)") {
    val out = GroupTop.topK(events, Seq("g"), "v", 2, "top")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("g1") == Seq("a", "b"))
    assert(out("g2") == Seq("z"))
  }

  test("topKConcat serializes and casts non-string values") {
    val num = Seq(("g", 5), ("g", 5), ("g", 3)).toDF("g", "v")
    val out = GroupTop.topKConcat(num, Seq("g"), "v", 2, "top").collect()
    assert(out.head.getString(1) == "5,3")
  }

  test("mode is deterministic across repeated runs") {
    val r1 = GroupTop.mode(events, Seq("g"), "v", "m").collect().toSet
    val r2 = GroupTop.mode(events, Seq("g"), "v", "m").collect().toSet
    assert(r1 == r2)
  }

  test("mode and topK are invariant under arbitrary repartitioning") {
    // shuffle arrival order must never influence tie-breaks or array order
    val base = GroupTop.topKConcat(events, Seq("g"), "v", 3, "t").collect().toSet
    val modeBase = GroupTop.mode(events, Seq("g"), "v", "m").collect().toSet
    for (parts <- Seq(1, 3, 7)) {
      val re = events.repartition(parts)
      assert(GroupTop.topKConcat(re, Seq("g"), "v", 3, "t").collect().toSet == base)
      assert(GroupTop.mode(re, Seq("g"), "v", "m").collect().toSet == modeBase)
    }
  }
}
