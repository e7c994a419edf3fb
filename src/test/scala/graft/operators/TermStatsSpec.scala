package graft.operators

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class TermStatsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark catalyst"),
    (2L, "spark flink trino"),
    (3L, "catalyst optimizer rules")
  ).toDF("doc_id", "text")

  test("termFreq counts repeats; df counts docs not occurrences") {
    val tf = TermStats.termFreq(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(tf.contains((1L, "spark", 3L)))
    assert(tf.contains((2L, "spark", 1L)))
  }

  test("topTerms ranks rare-but-frequent terms above ubiquitous ones") {
    val top = TermStats.topTerms(docs, "doc_id", "text", k = 1)
      .as[(Long, String, Long)].collect().map(t => t._1 -> t._2).toMap
    // doc 1: spark has tf=3 but df=2; catalyst tf=1 df=2 → spark wins on tf
    assert(top(1L) == "spark")
    // doc 3: optimizer/rules (df=1) beat catalyst (df=2); tie broken by term asc
    assert(top(3L) == "optimizer")
  }

  test("topTerms score matches hand computation in micro-units") {
    // doc 2 "flink": tf=1, df=1, N=3 → (ln(4/2)+1) = ln(2)+1
    val expected = math.floor((math.log(2.0) + 1.0) * 1e6 + 0.5).toLong
    val score = TermStats.topTerms(docs, "doc_id", "text", k = 5)
      .filter(col("doc_id") === 2L && col("term") === "flink")
      .select("score_e6").as[Long].head()
    assert(score == expected)
  }

  test("topAdjacentPairs counts BPE merge candidates with deterministic rank") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    // pairs: (a,b)×3, (b,a)×1, (b,c)×1, (b,x)×1
    val out = TermStats.topAdjacentPairs(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      ("a", "b", 3L, 1),
      ("b", "a", 1L, 2),   // count tie broken by (left, right) ascending
      ("b", "c", 1L, 3)))
  }

  test("topAdjacentPairs ignores single-token docs") {
    val docs = Seq((1L, "solo"), (2L, "x y")).toDF("doc_id", "text")
    val out = TermStats.topAdjacentPairs(docs, "doc_id", "text", k = 10).collect()
    assert(out.length == 1 && out.head.getString(0) == "x")
  }

  test("corpusFrequencyScores computes exact global-frequency statistics") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // global: a=3, b=1, c=1
    val out = TermStats.corpusFrequencyScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((3L, 1L, 2L * 3L + 1L, math.floor(7.0 / 3.0 * 1e6 + 0.5).toLong)))
    assert(out(2L) == ((2L, 1L, 3L + 1L, 2000000L)))
  }

  test("gramNovelty counts corpus-unique grams per doc, keeps gram-less docs") {
    val docs = Seq(
      (1L, "a b c d"),   // grams: abc, bcd
      (2L, "a b c e"),   // grams: abc, bce — shares abc with doc 1
      (3L, "x y")        // too short for trigrams
    ).toDF("doc_id", "text")
    val out = TermStats.gramNovelty(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 1L, 500000L))) // bcd unique, abc shared
    assert(out(2L) == ((2L, 1L, 500000L)))
    assert(out(3L) == ((0L, 0L, 0L)))
  }

  test("repetitionFromTokens measures duplicate-gram fraction exactly") {
    val out = Seq(
      (1L, "a a a a"),          // 2-grams: 3 total, 1 distinct → 2/3
      (2L, "w x y z"),          // no repeats → 0
      (3L, "w")                 // shorter than n → 0
    ).toDF("doc_id", "text")
      .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
      .select(col("doc_id"),
        floor(Text.repetitionFromTokens(col("ws"), 2) * 1e6 + 0.5).as("rep"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 666667L)
    assert(out(2L) == 0L)
    assert(out(3L) == 0L)
  }

  test("tokenEntropy: uniform max, degenerate zero, mixed hand value") {
    def eTerm(tf: Long): Long =
      math.floor(tf.toDouble * math.log(tf.toDouble) * 1e6 + 0.5).toLong
    def h(n: Long, s: Long): Long =
      math.floor(math.log(n.toDouble) * 1e6 + 0.5).toLong -
        math.floor(s.toDouble / n + 0.5).toLong
    val out = Seq(
      (1L, "a b c d"),      // uniform: H = ln(4)
      (2L, "a a a a"),      // degenerate: H = 0
      (3L, "a a b")         // mixed: ln(3) − (2ln2)/3
    ).toDF("doc_id", "text")
    val got = TermStats.tokenEntropy(out, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 4L, h(4, 0))))
    assert(got(1L)._4 == math.floor(math.log(4.0) * 1e6 + 0.5).toLong)
    assert(got(2L) == ((2L, 4L, 1L, h(4, eTerm(4)))))
    assert(got(2L)._4 == 0L)
    assert(got(3L) == ((3L, 3L, 2L, h(3, eTerm(2)))))
  }

  test("blocklistHits: tf-weighted counts, deterministic first hit, clean docs pass") {
    val docs2 = Seq(
      (1L, "bad worse bad fine"),
      (2L, "all clean words"),
      (3L, "worse")
    ).toDF("doc_id", "text")
    val out = TermStats.blocklistHits(docs2, "doc_id", "text", Seq("bad", "worse"))
      .as[(Long, Long, Option[String], Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, Some("bad"), true)))
    assert(out(2L) == ((2L, 0L, None, false)))
    assert(out(3L) == ((3L, 1L, Some("worse"), true)))
  }

  test("vocabCoverage: top-v by corpus frequency, tf-weighted OOV, term-asc ties") {
    val docs2 = Seq(
      (1L, "a a a b b c"),   // cf: a=3(+1 below)=4, b=3, c=2, d=1
      (2L, "a b c d")
    ).toDF("doc_id", "text")
    val out = TermStats.vocabCoverage(docs2, "doc_id", "text", v = 2)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // vocab = {a, b}; doc 1: 6 tokens, oov = c(1) = 1; doc 2: oov = c+d = 2
    assert(out(1L) == ((1L, 6L, 1L, math.floor(1.0 / 6 * 1e6 + 0.5).toLong)))
    assert(out(2L) == ((2L, 4L, 2L, 500000L)))
  }

  test("vocabCoverage: cf ties break by term ASC; full vocab means zero OOV") {
    val docs2 = Seq((1L, "x y")).toDF("doc_id", "text") // cf: x=1, y=1 tie
    val one = TermStats.vocabCoverage(docs2, "doc_id", "text", v = 1)
      .as[(Long, Long, Long, Long)].head()
    assert(one == ((1L, 2L, 1L, 500000L))) // vocab = {x} (tie → term asc)
    val all = TermStats.vocabCoverage(docs2, "doc_id", "text", v = 5)
      .as[(Long, Long, Long, Long)].head()
    assert(all == ((1L, 2L, 0L, 0L)))
  }
}
