package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class BpeSpec extends SparkSpec {

  test("train learns the hand-computed merge sequence") {
    // vocab {aaab:3, aab:2}: pair counts round 1 — (a,a)=8, (a,b)=5,
    // (b,</w>)=5 → merge (a,a); round 2 — (b,</w>)=5 wins; round 3 —
    // tie (aa,a)=3 vs (a,b</w>)=3 breaks lexicographically to (a,b</w>)
    val merges = Bpe.train(Seq("aaab" -> 3L, "aab" -> 2L), numMerges = 3)
    assert(merges == Seq(("a", "a"), ("b", "</w>"), ("a", "b</w>")))
  }

  test("encodeWord applies merges by rank priority, not position") {
    val ranks = Map(("b", "c") -> 0, ("a", "b") -> 1)
    // "abc": (a,b) occurs first positionally but (b,c) has lower rank
    assert(Bpe.encodeWord("abc", ranks).toSeq == Seq("a", "bc", "</w>"))
    // with flipped priority the other merge fires first, then chains
    val flipped = Map(("a", "b") -> 0, ("b", "c") -> 1, ("ab", "c") -> 2)
    assert(Bpe.encodeWord("abc", flipped).toSeq == Seq("abc", "</w>"))
  }

  test("encodeWord merges all occurrences left-to-right and terminates") {
    val merges = Bpe.train(Seq("aaaa" -> 1L), 10)
    val out = Bpe.encodeWord("aaaaaa", merges.zipWithIndex.toMap)
    assert(out.mkString == "aaaaaa" + "</w>")
    assert(Bpe.encodeWord("", Map.empty).isEmpty)
    assert(Bpe.encodeWord("x", Map.empty).toSeq == Seq("x", "</w>"))
  }

  test("full pipeline: distributed word freq -> train -> encode round-trips text") {
    val texts = Seq("low low lower", "lowest low newer", "new newer newest low")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 3),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val wf = Bpe.wordFrequencies(df, "doc_id", "text", topV = 100)
    assert(wf.head == ("low" -> 4L))                // freq-desc deterministic
    val merges = Bpe.train(wf, numMerges = 20)
    val enc = Bpe.encodeDocs(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // concatenating subtokens and stripping markers reconstructs the text
    for ((t, i) <- texts.zipWithIndex)
      assert(enc(i.toLong).mkString.replace("</w>", " ").trim == t)
    // n_subtokens column agrees with the array
    val ns = Bpe.encodeDocs(df, "doc_id", "text", merges)
      .collect().map(r => r.getSeq[String](1).length.toLong == r.getLong(2))
    assert(ns.forall(identity))
  }

  test("encoding is independent of input partitioning") {
    val texts = (0 until 50).map(i => i.toLong -> s"token$i repeated token${i % 7} mix")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map { case (i, t) => Row(i, t) }, 4),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val merges = Bpe.train(Bpe.wordFrequencies(df, "doc_id", "text", 50), 30)
    def run(parts: Int) = Bpe.encodeDocs(df.repartition(parts), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(run(1) == run(11))
  }

  test("wordFrequencies honors the vocabulary bound") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a b c d e f g h i j k"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    assert(Bpe.wordFrequencies(df, "doc_id", "text", 5).size == 5)
  }

  test("golden fixture: merges and encodings match an independent reference") {
    // src/test/resources/bpe-golden.txt was produced by an INDEPENDENT
    // re-implementation of the published algorithm (Sennrich et al. 2016,
    // learn + greedy apply) sharing only this operator's documented tie
    // rule (count DESC, pair lexicographic ASC; the original subword-nmt
    // script breaks count ties by LARGEST pair — a pinned, documented
    // difference). Corpus lines and parameters (topV=16, 20 merges) are
    // embedded in the fixture header.
    val src = scala.io.Source.fromFile("src/test/resources/bpe-golden.txt")
    val lines = try src.getLines().toSeq finally src.close()
    val corpus = lines.filter(_.startsWith("#   ")).map(_.drop(4))
    assert(corpus.size == 3)
    val goldenMerges = lines.filterNot(_.startsWith("#")).takeWhile(_.contains("\t"))
      .map { l => val Array(a, b) = l.split("\t", 2); (a, b) }
    val goldenEncodings = lines.filterNot(_.startsWith("#")).dropWhile(_.contains("\t"))
      .map(_.split(" \\| ").map(_.split(" ").toSeq).toSeq)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        corpus.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val merges = Bpe.train(Bpe.wordFrequencies(df, "doc_id", "text", topV = 16), 20)
    assert(merges == goldenMerges, "merge table must match the reference token-for-token")
    val ranks = merges.zipWithIndex.toMap
    corpus.zip(goldenEncodings).foreach { case (line, expected) =>
      val got = line.split(" ").toSeq.map(w => Bpe.encodeWord(w, ranks).toSeq)
      assert(got == expected, s"encoding of '$line' must match the reference")
    }
    // and the distributed encoder agrees with the golden stream of tokens
    val encoded = Bpe.encodeDocs(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    corpus.zipWithIndex.foreach { case (_, i) =>
      assert(encoded(i.toLong) == goldenEncodings(i).flatten)
    }
  }
}
