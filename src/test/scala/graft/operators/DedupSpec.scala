package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "the quick brown fox jumps"),   // exact dup of 1
    (3L, "the quick brown fox leaps"),   // near-dup of 1
    (4L, "completely different text here entirely"),
    (5L, "the quick brown fox jumps")    // exact dup of 1
  ).toDF("doc_id", "text")

  test("exactGroups keeps min id and counts dups") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(g(1L) == 3)
    assert(g(3L) == 1)
    assert(g(4L) == 1)
  }

  test("exactDedup keeps exactly the min-id row per distinct text") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text").select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("jaccardPairs matches hand-computed trigram Jaccard") {
    // doc1/doc3 trigrams: {tqb,qbf,bfj} vs {tqb,qbf,bfl} → inter 2, union 4 → 0.5
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val d13 = pairs.find(p => p._1 == 1L && p._2 == 3L)
    assert(d13.exists(_._3 == 0.5))
    // identical docs → jaccard 1.0
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    // doc4 shares no trigram with doc1
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("jaccardPairs maxGramFreq caps hot shingles consistently") {
    // "the quick brown" appears in 4 docs; capping at 3 removes it from both
    // numerator and denominator (same shingle universe both sides).
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.0, maxGramFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0) // identical docs still 1.0 on capped universe
  }

  test("minHash signature has requested width and identical docs agree") {
    val sig = Dedup.minHashSignatures(docs, "doc_id", "text", n = 3, numHashes = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L).size == 16)
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(4L))
  }

  test("minHashLshPairs finds exact and near dups, estimates sensibly") {
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 16, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L))) // true jaccard 0.5 → est above 0.3 with 64 hashes
  }

  test("simHashPairs output is invariant under block geometry") {
    // completeness: every pair within the Hamming radius is found regardless
    // of (blocks, blocksPerKey) — the geometry only changes JOIN volume
    val defaults = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 7,
      portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val wide = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 7,
      blocks = 9, blocksPerKey = 2, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(defaults.nonEmpty)
    assert(defaults == wide)
  }

  test("wider simhash block geometry bounds candidate volume at corpus scale") {
    import org.apache.spark.sql.functions._
    // 50k synthetic 60-bit fingerprints; candidate-join volume is measured
    // analytically (Σ per-bucket n·(n−1)/2 over the key relation) so the
    // quadratic geometry never has to be materialized
    val n = 50000L
    val sigs = spark.range(n).select(
      col("id").as("doc_id"),
      xxhash64(col("id")).bitwiseAND(lit((1L << 60) - 1)).as("simhash"))
    def joinVolume(blocks: Int, blocksPerKey: Int): Long =
      Dedup.candidateKeys(sigs, "doc_id", maxHamming = 7, bits = 60, blocks, blocksPerKey)
        .groupBy("grp", "grp_key").count()
        .agg(sum(col("count") * (col("count") - lit(1)))).head.getLong(0) / 2
    val pigeonhole = joinVolume(8, 1) // plain: ~7-bit keys
    val wide = joinVolume(9, 2)       // scale geometry: ~13-bit keys
    assert(wide <= 200L * n, s"wide geometry volume $wide not O(N)")
    assert(wide * 5 < pigeonhole,
      s"wide geometry ($wide) should be far below plain pigeonhole ($pigeonhole)")
  }

  test("simHashPairs supports maxHamming=0 over the full 64-bit family (single-block key)") {
    // exact-fingerprint dedup geometry: one block of width 64 — the key is
    // the whole fingerprint (regression: the packed-key width cap used to
    // reject this, and a (1L << 64) mask would wrap to 1L)
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.nonEmpty)
    assert(pairs.values.forall(_ == 0))
    assert(pairs.contains((1L, 2L))) // identical docs
  }

  test("simHash of identical docs equal; simHashPairs finds them at distance 0") {
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs((2L, 5L)) == 0)
  }

  test("containmentPairs catches short-in-long embedding that Jaccard misses") {
    val spark2 = spark
    import spark2.implicits._
    val short = "the quick brown fox jumps"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, "totally different words here now")).toDF("doc_id", "text")
    // doc 1: 3 trigrams, all inside doc 2 → containment_a = 1.0; doc 2 has
    // 43 trigrams → jaccard = 3/43 ≈ 0.07, far below any useful threshold
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5).count()
    assert(jac == 0L)
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(cont.length == 1)
    assert(cont.head._1 == 1L && cont.head._2 == 2L)
    assert(cont.head._3 == 1.0)
    assert(cont.head._4 < 0.1)
  }
}
