package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("wordNGrams yields distinct n-grams; short docs yield empty array") {
    val df = Seq((1, "a b c d"), (2, "a b"), (3, "x y x y x")).toDF("id", "text")
    val out = df.select(col("id"), Text.wordNGrams(col("text"), 3).as("g"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(out(1) == Seq("a b c", "b c d"))
    assert(out(2).isEmpty)
    assert(out(3).toSet == Set("x y x", "y x y")) // distinct
  }

  test("tokensRegex splits letter runs, digit runs, symbols") {
    val df = Seq((1, "ab12 cd, e!")).toDF("id", "text")
    val out = df.select(Text.tokensRegex(col("text"))).collect().head.getSeq[String](0)
    assert(out == Seq("ab", "12", "cd", ",", "e", "!"))
  }

  test("qualityScore is in [0,1] and favors real English text") {
    val df = Seq(
      (1, "the quick brown fox jumps over the lazy dog and runs in to the woods"),
      (2, "#### !!!! @@@@ $$$$ %%%%")
    ).toDF("id", "text")
    val out = df.select(col("id"), Text.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(1) > out(2))
  }

  test("qualityScore of empty text is 0, not a divide-by-zero failure") {
    val out = Seq((1, "")).toDF("id", "text")
      .select(Text.qualityScore(col("text")).as("q"))
      .collect().head.getDouble(0)
    assert(out == 0.0)
  }

  test("langId identifies stopword-rich languages, und for gibberish") {
    val df = Seq(
      (1, "the cat is in the house and it is warm"),
      (2, "le chat est dans la maison et il est chaud"),
      (3, "der Hund ist in dem Haus und er ist warm"),
      (4, "zzz qqq vvv")
    ).toDF("id", "text")
    val out = df.select(col("id"), Text.langId(col("text")).as("l"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "en")
    assert(out(2) == "fr")
    assert(out(3) == "de")
    assert(out(4) == "und")
  }

  test("fingerprint matches the reference polynomial hash, codegen and interpreted") {
    val s = "hello world"
    val expected = graft.functions.expressions.RollingHash.hashBytes(
      s.getBytes("UTF-8"))
    val df = Seq((1, s)).toDF("id", "text")
    val out = df.select(Text.fingerprint(col("text"))).collect().head.getLong(0)
    assert(out == expected)
    // distinct strings produce distinct hashes (sanity, not a law)
    val out2 = Seq((1, "hello worlD")).toDF("id", "text")
      .select(Text.fingerprint(col("text"))).collect().head.getLong(0)
    assert(out2 != expected)
  }

  test("fingerprint propagates null input as null output") {
    val df = Seq((1, Option("x")), (2, Option.empty[String])).toDF("id", "text")
    val out = df.select(col("id"), Text.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(!out(1) && out(2))
  }

  test("fingerprint is order-sensitive") {
    val df = Seq((1, "ab"), (2, "ba")).toDF("id", "text")
    val out = df.select(Text.fingerprint(col("text"))).as[Long].collect()
    assert(out(0) != out(1))
  }
}
