package graft.operators

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  test("overlapping windows cover every token with the configured stride") {
    val df = Seq((1L, doc(12))).toDF("doc_id", "text")
    val chunks = Chunking.tokenChunks(df, "doc_id", "text", chunkTokens = 5, stride = 3)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    // n=12, chunk=5, stride=3 → ceil(7/3)+1 = 4 chunks
    assert(chunks.toSeq == Seq(
      "w1 w2 w3 w4 w5", "w4 w5 w6 w7 w8", "w7 w8 w9 w10 w11", "w10 w11 w12"))
  }

  test("short and exact-length docs yield exactly one chunk") {
    val df = Seq((1L, doc(3)), (2L, doc(5))).toDF("doc_id", "text")
    val n = Chunking.tokenChunks(df, "doc_id", "text", 5, 3)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 1L, 2L -> 1L))
  }

  test("plan is shuffle-free (narrow chunking at any scale)") {
    val df = Seq((1L, doc(100))).toDF("doc_id", "text")
    val plan = Chunking.tokenChunks(df, "doc_id", "text", 10, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("invalid geometry is rejected") {
    val df = Seq((1L, doc(5))).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.tokenChunks(df, "doc_id", "text", chunkTokens = 5, stride = 6)
    }
  }
}
