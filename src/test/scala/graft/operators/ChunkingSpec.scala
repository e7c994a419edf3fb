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

  // deterministic token stream for the CDC tests; tokens are
  // position-unique so identical windows imply identical positions
  private def cdcDoc(n: Int, seed: Int): String =
    (1 to n).map(i => s"t$i-${(i * 2654435761L + seed * 40503L) % 97}").mkString(" ")

  test("contentDefinedChunks: chunks partition the doc exactly") {
    val df = Seq((1L, cdcDoc(80, 1)), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val out = Chunking.contentDefinedChunks(df, "doc_id", "text", w = 3, divisor = 8)
      .as[(Long, Int, Long, String)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(_._3).sum == 80L)        // token counts partition
    assert(byDoc(1L).map(_._2).sorted.toSeq == (0 until byDoc(1L).length)) // dense idx
    assert(byDoc(2L).length == 1 && byDoc(2L).head._3 == 2L) // short doc = 1 chunk
    assert(byDoc(3L).head._4 ==                    // "" splits to [""] → md5("")
      "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("contentDefinedChunks: boundaries re-synchronize after an insertion") {
    val base = cdcDoc(120, 7)
    val shifted = "zzz " + base
    val df = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val out = Chunking.contentDefinedChunks(df, "doc_id", "text", w = 3, divisor = 8)
      .as[(Long, Int, Long, String)].collect()
    val a = out.filter(_._1 == 1L).map(_._4).toSet
    val b = out.filter(_._1 == 2L).map(_._4).toSet
    // CDC property: all chunks past the first post-edit boundary are
    // byte-identical; only the chunk(s) containing the edit differ.
    val shared = a.intersect(b).size
    assert(shared >= a.size - 2, s"expected resync, shared=$shared of ${a.size}")
    // contrast: fixed-window chunking shares nothing after a 1-token shift
    val fixedA = Chunking.tokenChunks(df.where($"doc_id" === 1), "doc_id", "text", 8, 8)
      .select("chunk").as[String].collect().toSet
    val fixedB = Chunking.tokenChunks(df.where($"doc_id" === 2), "doc_id", "text", 8, 8)
      .select("chunk").as[String].collect().toSet
    assert(fixedA.intersect(fixedB).isEmpty)
  }

  test("contentDefinedChunks: shuffle-free plan and argument validation") {
    val df = Seq((1L, cdcDoc(50, 3))).toDF("doc_id", "text")
    val plan = Chunking.contentDefinedChunks(df, "doc_id", "text", 4, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"CDC chunking must not shuffle:\n$plan")
    intercept[IllegalArgumentException] {
      Chunking.contentDefinedChunks(df, "doc_id", "text", w = 4, divisor = 1)
    }
  }
}
