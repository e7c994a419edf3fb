package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  // 1↔2: one substitution ("dog"→"cat" = 3 char subs); 3 unrelated;
  // 4↔5: identical (dist 0); texts long enough for 3-gram candidates
  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy cat tonight"),
    (3L, "an entirely different document about database engines"),
    (4L, "duplicate rows should still be found by the refine step"),
    (5L, "duplicate rows should still be found by the refine step")
  ).toDF("doc_id", "text")

  test("finds small-edit and exact pairs, not unrelated docs") {
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = 5, n = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 3)))
    assert(pairs.contains((4L, 5L, 0)))
    assert(pairs.size == 2)
  }

  test("maxDist bounds the refine: distance-3 pair excluded at maxDist=2") {
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = 2, n = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((4L, 5L, 0)))
  }

  test("removeBoilerplate drops corpus-repeated chunks, keeps unique content in order") {
    // window=2: "COOKIE BANNER" appears in 3 docs → boilerplate at
    // maxDocFreq=2; unique content survives in original order
    val docs = Seq(
      (1L, "COOKIE BANNER alpha beta gamma delta"),
      (2L, "COOKIE BANNER epsilon zeta eta theta"),
      (3L, "COOKIE BANNER iota kappa lambda mu"),
      (4L, "completely unique document four text")
    ).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, "doc_id", "text",
        window = 2, maxDocFreq = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha beta gamma delta")
    assert(out(2L) == "epsilon zeta eta theta")
    assert(out(3L) == "iota kappa lambda mu")
    assert(out(4L) == "completely unique document four text")
  }

  test("removeBoilerplate drops a fully-boilerplate doc from the result") {
    val docs = Seq(
      (1L, "SAME SAME"), (2L, "SAME SAME"), (3L, "SAME SAME"),
      (4L, "real content here now")
    ).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, "doc_id", "text",
        window = 2, maxDocFreq = 2)
      .as[(Long, String)].collect().toMap
    assert(out == Map(4L -> "real content here now"))
  }

  test("matches a brute-force all-pairs levenshtein on candidate-covered pairs") {
    val maxDist = 5
    val fast = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist, n = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val b = docs.select(col("doc_id").as("id_b"), col("text").as("tb"))
    val brute = docs.join(b, col("doc_id") < col("id_b") &&
        levenshtein(col("text"), col("tb")) <= maxDist)
      .select(col("doc_id"), col("id_b")).as[(Long, Long)].collect().toSet
    // docs here carry far more than maxDist*(n+1) shingles → lossless
    assert(fast == brute)
  }
}
