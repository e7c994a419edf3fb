package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Statistical properties of the probabilistic dedup operators, on
  * generated corpora with controlled overlap (fixed seeds — deterministic
  * despite being property-style). */
class DedupPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = ('a' to 'z').map(_.toString)

  /** Two docs sharing a `share` fraction of a base token sequence. */
  private def docPair(seed: Long, share: Double): (String, String) = {
    val g = Gen.listOfN(60, Gen.oneOf(vocab))
    val base = g.apply(Gen.Parameters.default, Seed(seed)).get
    val alt = g.apply(Gen.Parameters.default, Seed(seed + 1000)).get
    val keep = (60 * share).toInt
    val a = base
    val b = base.take(keep) ++ alt.drop(keep)
    (a.mkString(" "), b.mkString(" "))
  }

  test("minhash estimate tracks true jaccard within 0.25 at 64 hashes") {
    val pairs = (1 to 8).map(i => docPair(i.toLong, 0.3 + (i % 4) * 0.2))
    val docs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i * 2L, a), (i * 2L + 1L, b))
    }.toDF("doc_id", "text")
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val est = Dedup.minHashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 32, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val paired = (0 until 8).flatMap { i =>
      val key = (i * 2L, i * 2L + 1L)
      for (e <- exact.get(key); m <- est.get(key)) yield (e, m)
    }
    assert(paired.size >= 6, s"LSH should catch most intra-pair candidates, got ${paired.size}")
    paired.foreach { case (e, m) =>
      assert(math.abs(e - m) < 0.25, s"exact=$e est=$m")
    }
  }

  test("jaccard is within [0,1], symmetric in construction, and 1.0 only for equal shingle sets") {
    val docs = (1 to 6).map(i => (i.toLong, docPair(i.toLong, 0.5)._1)).toDF("doc_id", "text")
    val withDup = docs.union(Seq((99L, docPair(1L, 0.5)._1)).toDF("doc_id", "text"))
    val out = Dedup.jaccardPairs(withDup, "doc_id", "text", n = 3, threshold = 0.0).collect()
    out.foreach { r =>
      val j = r.getDouble(2)
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getLong(0) < r.getLong(1)) // canonical ordering = symmetry
    }
    val dupPair = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 99L)
    assert(dupPair.exists(_.getDouble(2) == 1.0))
  }

  test("simhash hamming distance correlates with document similarity") {
    val (nearA, nearB) = docPair(7L, 0.9)
    val (_, far) = docPair(8L, 0.0)
    val docs = Seq((1L, nearA), (2L, nearB), (3L, far)).toDF("doc_id", "text")
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
  }
}
