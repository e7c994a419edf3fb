package graft.operators

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 and 2 share the 8-token run "a b c d e f g h" at different
  // offsets; doc 3 is clean; doc 4/5 share TWO runs separated by a gap in
  // doc 4; doc 6 repeats a run internally but shares it with no other doc.
  private def docs = Seq(
    (1L, "x1 x2 a b c d e f g h y1 y2"),
    (2L, "a b c d e f g h z1 z2 z3"),
    (3L, "q r s t u v w"),
    (4L, "m n o p q1 GAP1 GAP2 GAP3 s1 s2 s3 s4"),
    (5L, "m n o p q1 w1 w2 w3 s1 s2 s3 s4"),
    (6L, "p1 p2 p3 p4 p1 p2 p3 p4")
  ).toDF("doc_id", "text")

  test("windowFingerprints emits one row per k-window, none for short docs") {
    val w = SubstringDedup.windowFingerprints(docs, "doc_id", "text", k = 4)
    val byDoc = w.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(1L) == 12 - 4 + 1)
    assert(byDoc(3L) == 7 - 4 + 1)
    assert(byDoc.get(42L).isEmpty)
    // identical window content hashes identically across docs
    val h1 = w.filter($"doc_id" === 1L && $"pos" === 2L).select("whash").as[String].head()
    val h2 = w.filter($"doc_id" === 2L && $"pos" === 0L).select("whash").as[String].head()
    assert(h1 == h2)
  }

  test("crossDocDupWindows flags only windows shared ACROSS documents") {
    val dup = SubstringDedup.crossDocDupWindows(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 1: shared run spans token offsets 2..9 → window starts 2..6
    assert((2L to 6L).forall(p => dup.contains((1L, p))))
    // doc 3 clean, doc 6's internal repeat is NOT cross-document
    assert(!dup.exists(_._1 == 3L))
    assert(!dup.exists(_._1 == 6L))
  }

  test("dupSpans merges overlapping windows into maximal spans, keeps gaps split") {
    val spans = SubstringDedup.dupSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: one span covering offsets 2..9 (8 tokens, 5 windows)
    assert(spans.contains((1L, 2L, 9L, 8L, 5L)))
    assert(spans.contains((2L, 0L, 7L, 8L, 5L)))
    // doc 4 shares "m n o p q1" (offsets 0..4) and "s1 s2 s3 s4" (8..11)
    // with doc 5 — the GAP tokens keep them as two separate spans
    assert(spans.contains((4L, 0L, 4L, 5L, 2L)))
    assert(spans.contains((4L, 8L, 11L, 4L, 1L)))
    assert(!spans.exists(_._1 == 3L))
  }

  test("keepOneDupWindows keeps the smallest (id, pos) occurrence, cuts the rest") {
    val cut = SubstringDedup.keepOneDupWindows(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 1 is canonical for the run it shares with doc 2 → doc 2's copies cut
    assert(!cut.exists(_._1 == 1L))
    assert((0L to 4L).forall(p => cut.contains((2L, p))))
    // doc 6's SECOND internal occurrence of "p1 p2 p3 p4" (pos 4) is cut
    assert(cut.contains((6L, 4L)))
    assert(!cut.contains((6L, 0L)))
  }

  test("cutDupSpans rebuilds text with one surviving copy per duplicated window") {
    val out = SubstringDedup.cutDupSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("x1 x2 a b c d e f g h y1 y2", 0L))) // canonical copy intact
    assert(out(2L) == (("z1 z2 z3", 8L)))                    // shared run removed
    assert(out(3L) == (("q r s t u v w", 0L)))               // clean doc untouched
    assert(out(5L) == (("w1 w2 w3", 9L)))                    // both shared runs removed
    assert(out(6L) == (("p1 p2 p3 p4", 4L)))                 // self-repeat halved
    assert(out.size == 6)
  }

  test("dupStats reports every doc with exact duplicated-token fractions") {
    val stats = SubstringDedup.dupStats(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(stats(1L) == ((12L, 8L, math.floor(8.0 / 12.0 * 1e6 + 0.5).toLong)))
    assert(stats(3L) == ((7L, 0L, 0L)))
    assert(stats(4L) == ((12L, 9L, 750000L)))
    assert(stats(6L) == ((8L, 0L, 0L)))
    assert(stats.size == 6) // zero-dup docs still present
  }
}
