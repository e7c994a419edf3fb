package graft

import graft.functions.expressions.JaroWinkler

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  test("classic literature cases (exact-rational e6)") {
    assert(JaroWinkler.jwE6("MARTHA", "MARHTA") === 961111L)
    assert(JaroWinkler.jwE6("DWAYNE", "DUANE") === 840000L)
    assert(JaroWinkler.jwE6("DIXON", "DICKSONX") === 813333L)
  }

  test("DuckDB-pinned semantics: either-empty -> 0, boost at jaro >= 0.7") {
    assert(JaroWinkler.jwE6("", "") === 0L) // textbook says 1; oracle says 0
    assert(JaroWinkler.jwE6("AB", "") === 0L)
    assert(JaroWinkler.jwE6("A", "A") === 1000000L)
    // jaro('hot plate','hot widget') is EXACTLY 7/10 — the boundary that
    // caught the > vs >= divergence in the 221k-pair oracle sweep
    assert(JaroWinkler.jwE6("hot plate", "hot widget") === 820000L)
    // common prefix but jaro below the threshold: no boost
    assert(JaroWinkler.jwE6("ABCVWXYZ", "ABCDEFGH") === 583333L)
  }

  test("symmetry and no-match") {
    assert(JaroWinkler.jwE6("abcd", "dcba") === JaroWinkler.jwE6("dcba", "abcd"))
    assert(JaroWinkler.jwE6("xx", "yy") === 0L)
  }

  test("BigInt path (>1000 chars) agrees with the exact rational") {
    val s1 = "a" * 1001
    val s2 = "a" * 1000 + "b"
    assert(JaroWinkler.jwE6(s1, s2) === 999600L) // computed independently
  }

  test("expression evaluates inside a DataFrame plan (codegen path)") {
    val got = Seq(("MARTHA", "MARHTA"), ("hot plate", "hot widget"))
      .toDF("a", "b")
      .select(JaroWinkler.jwE6($"a", $"b").as("jw"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(961111L, 820000L))
  }

  test("properties: symmetry, range, identity over 200 generated pairs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def str(seed: Long, n: Int): String =
      Gen.listOfN(n, Gen.alphaLowerChar)
        .apply(Gen.Parameters.default, Seed(seed)).get.mkString
    (1 to 200).foreach { i =>
      val a = str(i.toLong, 1 + i % 14)
      val b = str(i.toLong + 5000L, 1 + (i * 7) % 14)
      val ab = JaroWinkler.jwE6(a, b)
      assert(ab === JaroWinkler.jwE6(b, a), s"asymmetric on $a/$b")
      assert(ab >= 0L && ab <= 1000000L, s"out of range on $a/$b: $ab")
      assert(JaroWinkler.jwE6(a, a) === 1000000L)
    }
  }

  test("null inputs yield null, not a crash") {
    val got = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(JaroWinkler.jwE6($"a", $"b").as("jw"))
      .collect().head
    assert(got.isNullAt(0))
  }
}
