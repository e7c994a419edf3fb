package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs; "common" appears everywhere (a stopword), "rare" in one doc.
  private def docs = Seq(
    (1L, "common rare alpha beta"),
    (2L, "common alpha beta gamma"),
    (3L, "common gamma delta delta"),
    (4L, "common rare alpha beta")
  ).toDF("doc_id", "text")

  private def run(qid: Long, k: Int = 3, maxDfFrac: Double = 1.0) =
    Retrieval.bm25TopK(docs, docs.where(col("doc_id") === qid),
      "doc_id", "text", "doc_id", "text", k = k, maxDfFrac = maxDfFrac)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)

  test("score matches the hand-computed BM25 formula in micro-units") {
    // Query doc 1 vs doc 4 (identical text): terms common, rare, alpha, beta.
    // N=4, sum_dl=16, every dl=4 → dl·N/Σdl = 1, tf-norm = tf·2.2/(tf+1.2).
    def idfE6(df: Int): Long =
      math.floor(math.log(1.0 + (4 - df + 0.5) / (df + 0.5)) * 1e6 + 0.5).toLong
    def contrib(df: Int, tf: Int): Long = {
      val tfn = tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * 4 * 4 / 16.0))
      math.floor(idfE6(df) * tfn + 0.5).toLong
    }
    val expected = contrib(4, 1) + contrib(2, 1) + contrib(3, 1) + contrib(3, 1)
    val top = run(1L).head
    assert(top._2 == 4L && top._3 == expected && top._4 == 1)
  }

  test("docs sharing rarer terms outrank docs sharing only stopwords") {
    val r = run(1L)
    // doc 4 (shares rare+alpha+beta) > doc 2 (alpha+beta) > doc 3 (common only)
    assert(r.map(_._2).toSeq == Seq(4L, 2L, 3L))
    assert(r(0)._3 > r(1)._3 && r(1)._3 > r(2)._3)
  }

  test("self-match is excluded and k bounds the result") {
    val r = run(1L, k = 2)
    assert(!r.exists(_._2 == 1L) && r.length == 2)
  }

  test("maxDfFrac prunes ubiquitous terms from candidate generation") {
    // common has df=4/4; at maxDfFrac=0.9 it is dropped, so doc 3 (which
    // shares ONLY "common" with doc 1) produces no candidate pair at all.
    val r = run(1L, maxDfFrac = 0.9)
    assert(!r.exists(_._2 == 3L))
    assert(r.map(_._2).toSet == Set(4L, 2L))
  }

  test("rrfFuse: consensus across legs beats a single leg's rank-1") {
    val sparse = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 20L, 1), (1L, 30L, 2), (1L, 40L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(sparse, dense), k = 4)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    def c(r: Int) = 1000000L / (60 + r)
    // doc 20: ranks 2+1 → both legs; beats doc 10 (sparse rank-1 only)
    assert(out.head._2 == 20L && out.head._3 == c(2) + c(1))
    assert(out.map(_._2).toSeq == Seq(20L, 30L, 10L, 40L))
    assert(out.find(_._2 == 10L).get._3 == c(1))
  }

  test("rrfFuse: equal contributions tie-break by doc_id ascending") {
    val a = Seq((1L, 7L, 1), (1L, 3L, 1)).toDF("query_id", "doc_id", "rank")
    // same rank in the same leg twice (two queries' legs concatenated is
    // the realistic shape; here both rows are rank 1 → equal scores)
    val out = Retrieval.rrfFuse(Seq(a), k = 2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(3L, 7L))
  }

  test("empty query set returns an empty frame with the contract schema") {
    val out = Retrieval.bm25TopK(docs, docs.where(col("doc_id") === -1),
      "doc_id", "text", "doc_id", "text", k = 3)
    assert(out.columns.toSeq == Seq("query_id", "doc_id", "score_e6", "rank"))
    assert(out.count() == 0)
  }
}
