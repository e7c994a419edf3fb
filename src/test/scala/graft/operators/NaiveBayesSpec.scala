package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def train = Seq(
    (1L, "ball goal striker", "sport"),
    (2L, "goal match ball", "sport"),
    (3L, "stock market price", "finance"),
    (4L, "price index market", "finance")
  ).toDF("doc_id", "text", "topic")

  test("recovers the obvious class for in-vocabulary docs") {
    val docs = Seq(
      (10L, "goal ball"),
      (11L, "market price stock")
    ).toDF("doc_id", "text")
    val out = NaiveBayes.classify(train, docs, "doc_id", "text", "topic")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out(10L) == "sport")
    assert(out(11L) == "finance")
  }

  test("score matches hand computation in micro-units") {
    // model: nd=2/2, ndt=4; V = 8 distinct terms (ball goal striker match
    // stock market price index); nc = 6 tokens per class
    // doc "goal ball": both terms n=2 in sport, n=0 in finance
    def lp(n: Long, nc: Long, v: Long): Long =
      math.floor(math.log((n + 1.0) / (nc + v).toDouble) * 1e6 + 0.5).toLong
    val prior = math.floor(math.log(2.0 / 4.0) * 1e6 + 0.5).toLong
    val expSport = prior + 2 * lp(2, 6, 8)
    val docs = Seq((10L, "goal ball")).toDF("doc_id", "text")
    val got = NaiveBayes.classify(train, docs, "doc_id", "text", "topic")
      .as[(Long, String, Long)].head()
    assert(got._2 == "sport")
    assert(got._3 == expSport)
  }

  test("tie scores break by label ascending") {
    // symmetric training: unseen-vocab doc scores equal in both classes
    val docs = Seq((20L, "zebra")).toDF("doc_id", "text")
    val got = NaiveBayes.classify(train, docs, "doc_id", "text", "topic")
      .as[(Long, String, Long)].head()
    assert(got._2 == "finance") // "finance" < "sport"
  }

  test("every doc gets exactly one prediction") {
    val docs = Seq((30L, ""), (31L, "ball"), (32L, "price")).toDF("doc_id", "text")
    val out = NaiveBayes.classify(train, docs, "doc_id", "text", "topic")
    assert(out.count() == 3L)
    assert(out.select("doc_id").distinct().count() == 3L)
  }

  test("hash-half NB on the real testdata beats the uniform baseline") {
    // the synthetic corpus draws ONE shared vocabulary for all langs, so
    // text barely predicts lang — the learnable ceiling is the majority
    // prior (~0.39 'en'). The classifier should land at or above it, and
    // far above uniform (0.2); a broken model join craters to ~0.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val trainHalf = docs.filter(
      graft.functions.PortableHash.hash60(col("doc_id")) % 2 === 0)
    val preds = NaiveBayes.classify(trainHalf, docs, "doc_id", "text", "lang")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    assert(preds.count() == docs.count())
    val acc = preds.agg(
      avg(when(col("pred_label") === col("lang"), 1.0).otherwise(0.0))).as[Double].head()
    assert(acc > 0.3, s"accuracy $acc")
  }

  test("uncertainMargins ranks ambiguous docs before confident ones") {
    val docs = Seq(
      (10L, "goal ball striker"),        // clearly sport → big margin
      (11L, "ball price"),               // one term each side → small margin
      (12L, "market price index stock")  // clearly finance → big margin
    ).toDF("doc_id", "text")
    val out = NaiveBayes.uncertainMargins(train, docs, "doc_id", "text", "topic", k = 3)
      .select($"doc_id", $"pred_label", $"margin_e6", $"unc_rank")
      .as[(Long, String, Long, Int)].collect().sortBy(_._4)
    assert(out.length == 3)
    assert(out.head._1 == 11L, s"most uncertain should be the mixed doc: ${out.toSeq}")
    assert(out.map(_._3).toSeq == out.map(_._3).sorted.toSeq) // margins ascend
    assert(out.forall(_._3 >= 0L))                            // s1 ≥ s2 by rank
    // margin is consistent with the classify surface: argmax label matches
    val preds = NaiveBayes.classify(train, docs, "doc_id", "text", "topic")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    out.foreach(r => assert(preds(r._1) == r._2))
  }

  test("confidentErrors surfaces the planted label flip, not correct rows") {
    // docs carry labels; doc 12's label is flipped to sport on purpose
    val docs = Seq(
      (10L, "goal ball striker", "sport"),          // correct → excluded
      (11L, "ball price", "finance"),               // ambiguous
      (12L, "market price index stock", "sport")    // planted noise
    ).toDF("doc_id", "text", "topic")
    val out = NaiveBayes.confidentErrors(train, docs, "doc_id", "text", "topic", k = 5)
      .select($"doc_id", $"topic", $"pred_label", $"margin_e6", $"noise_rank")
      .as[(Long, String, String, Long, Int)].collect().sortBy(_._5)
    assert(!out.exists(_._1 == 10L))             // agreeing rows never flagged
    assert(out.head._1 == 12L)                   // the flip is the top hit
    assert(out.head._3 == "finance" && out.head._2 == "sport")
    assert(out.map(_._4).toSeq == out.map(_._4).sorted(Ordering[Long].reverse).toSeq)
  }

  test("calibrationCurve: buckets partition docs; accuracy rises with margin here") {
    val docs = (1L to 20L).map { i =>
      if (i % 4 == 0) (i, "ball price", "sport")              // ambiguous, half wrong
      else if (i % 2 == 0) (i, "goal ball striker", "sport")  // confident correct
      else (i, "market price index stock", "finance")         // confident correct
    }.toDF("doc_id", "text", "topic")
    val out = NaiveBayes.calibrationCurve(train, docs, "doc_id", "text", "topic", buckets = 4)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).sum == 20L)            // every doc in exactly one bucket
    assert(out.map(_._1).toSeq == Seq(1, 2, 3, 4))
    // the top-margin bucket is all confident in-vocabulary docs → perfect
    assert(out.last._4 == 1000000L, s"top bucket should be clean: ${out.toSeq}")
    assert(out.head._4 <= out.last._4)          // monotone here by construction
  }

  test("uncertainMargins: k truncates and ranking is deterministic") {
    val docs = Seq((10L, "goal ball"), (11L, "ball price"), (12L, "stock market"))
      .toDF("doc_id", "text")
    val one = NaiveBayes.uncertainMargins(train, docs, "doc_id", "text", "topic", k = 1)
      .as[(Long, String, Long, Int)].collect()
    assert(one.length == 1 && one.head._4 == 1)
    val again = NaiveBayes.uncertainMargins(train, docs, "doc_id", "text", "topic", k = 1)
      .as[(Long, String, Long, Int)].collect()
    assert(one.toSeq == again.toSeq)
  }
}
