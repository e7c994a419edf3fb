package graft.operators

import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def scores(rows: Seq[(String, String)], iters: Int = 3) =
    Preference.bradleyTerry(rows.toDF("winner", "loser"), "winner", "loser",
        iterations = iters)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("a dominance chain orders the scores; wins are counted per item") {
    val out = scores(Seq(
      ("a", "b"), ("a", "b"), ("a", "b"),
      ("b", "c"), ("b", "c")))
    assert(out("a")._1 == 3L && out("b")._1 == 2L && out("c")._1 == 0L)
    assert(out("a")._2 > out("b")._2)
    assert(out("b")._2 > out("c")._2)
    assert(out("c")._2 >= 1L) // the zero-win clamp keeps every score positive
  }

  test("symmetric records give symmetric scores; mean stays 1.0") {
    val out = scores(Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "a")))
    assert(out("a")._2 == out("b")._2)
    val total = out.values.map(_._2).sum
    assert(math.abs(total - out.size * 1000000L) <= out.size) // truncation slack
  }

  test("self-comparisons and nulls are ignored; weights multiply evidence") {
    val withJunk = Seq(
      ("a", "a", 100L), ("a", "b", 1L), (null, "b", 50L), ("b", null, 50L)
    ).toDF("winner", "loser", "n")
    val out = Preference.bradleyTerry(withJunk, "winner", "loser",
        weightCol = Some("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "b" -> 0L)) // only the real a>b row counts
    // the weighted form matches the row-repeated form exactly
    val weighted = Preference.bradleyTerry(
      Seq(("a", "b", 3L), ("b", "c", 2L)).toDF("w", "l", "n"), "w", "l",
      weightCol = Some("n"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val repeated = scores(Seq(
      ("a", "b"), ("a", "b"), ("a", "b"), ("b", "c"), ("b", "c")))
    assert(weighted == repeated.view.mapValues(_._2).toMap)
  }

  test("the item gate refuses unbounded domains") {
    val big = (1 to 60).map(i => (s"w$i", s"l$i")).toDF("winner", "loser")
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(big, "winner", "loser", maxItems = 100)
    }
  }
}
