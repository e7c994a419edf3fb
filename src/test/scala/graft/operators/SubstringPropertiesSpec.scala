package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized invariants for the substring-dup family — a seeded corpus
  * with injected cross-document plagiarism, checked for the algebraic
  * properties the operators promise rather than hand-computed outputs. */
class SubstringPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5

  /** 40 deterministic docs over a 12-word vocab; a third of them splice in
    * a slice of an earlier doc (the cross-doc duplication under test). */
  private def corpus = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = Vector.tabulate(40) { i =>
      Vector.fill(12 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
    }
    val docs = base.zipWithIndex.map { case (ws, i) =>
      val spliced =
        if (i % 3 == 0 && i > 0) {
          val src = base(rnd.nextInt(i))
          val from = rnd.nextInt(math.max(1, src.size - K - 2))
          val len = K + 2 + rnd.nextInt(4)
          val cut = rnd.nextInt(ws.size)
          (ws.take(cut) ++ src.slice(from, math.min(src.size, from + len)) ++ ws.drop(cut))
        } else ws
      (i.toLong, spliced.mkString(" "))
    }
    docs.toDF("doc_id", "text")
  }

  test("generator window relation ≡ the HOF explode(transform) construction") {
    val hof = corpus
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("__ws"))
      .filter(size(col("__ws")) >= K)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("__ws")) - K),
          i => struct(i.cast("long").as("pos"),
            md5(concat_ws(" ", slice(col("__ws"), i + 1, lit(K)))).as("whash")))).as("__w"))
      .select(col("doc_id"), col("__w.pos"), col("__w.whash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val gen = SubstringDedup.windowFingerprints(corpus, "doc_id", "text", K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(gen == hof)
  }

  test("dupStats totals equal the sum of merged span lengths") {
    val spans = SubstringDedup.dupSpans(corpus, "doc_id", "text", K)
      .groupBy("doc_id").agg(sum("span_tokens").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stats = SubstringDedup.dupStats(corpus, "doc_id", "text", K)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    stats.foreach { case (id, dup) => assert(dup == spans.getOrElse(id, 0L)) }
  }

  test("merged spans are disjoint and non-adjacent per document") {
    val spans = SubstringDedup.dupSpans(corpus, "doc_id", "text", K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    spans.values.foreach { ss =>
      val sorted = ss.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach { w =>
        if (w.size == 2) {
          val (_, _, e1) = w(0); val (_, s2, _) = w(1)
          assert(s2 > e1 + 1, "spans should have merged")
        }
      }
    }
  }

  test("cutting removes exactly the span-covered tokens") {
    val cut = SubstringDedup.cutDupSpans(corpus, "doc_id", "text", K)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val orig = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cut.foreach { case (id, (clean, nCut)) =>
      val n = orig(id).split(" ").length
      if (nCut > 0 && clean.nonEmpty)
        assert(clean.split(" ").length == n - nCut)
      if (nCut == 0) assert(clean == orig(id))
    }
  }

  test("keep-one cutting strictly reduces duplicated windows") {
    val before = SubstringDedup.keepOneDupWindows(corpus, "doc_id", "text", K).count()
    assert(before > 0, "fixture must contain injected duplication")
    val cleaned = SubstringDedup.cutDupSpans(corpus, "doc_id", "text", K)
      .select(col("doc_id"), col("clean_text").as("text"))
    val after = SubstringDedup.keepOneDupWindows(cleaned, "doc_id", "text", K).count()
    // cutting can create NEW juxtaposed windows at span borders (documented
    // in Lee et al. too), so exact zero isn't guaranteed — but the
    // duplication mass must collapse
    assert(after < before / 2, s"dup windows $before -> $after")
  }
}
