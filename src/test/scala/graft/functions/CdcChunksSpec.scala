package graft.functions

import graft.SparkSpec
import graft.functions.expressions.CdcChunks
import org.apache.spark.sql.functions._

/** Pins the native CDC generator against INDEPENDENT recomputations:
  * the per-token hash against the Spark-SQL PortableHash expression (the
  * oracle's definition), and the rolling boundary hash against a
  * brute-force BigInt polynomial per window (no rolling, no masking
  * tricks) — so a bug in the O(1) roll or the 60-bit wrap arithmetic
  * cannot hide behind a matching implementation on both sides. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private val tokens = Seq("a", "", "hello", "héllo", "日本語", "x" * 50, "123", "a b")

  test("per-token hash matches PortableHash.hash60 bit-for-bit") {
    val viaSql = tokens.toDF("t")
      .select(PortableHash.hash60(col("t")).as("h"))
      .as[Long].collect().toSeq
    // the generator's private tokenHash surfaces through single-token docs
    // with w = 1: every position is a window, H = h60(token) · M^0 = h60
    val viaGen = tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // can't split on space without breaking tokens containing spaces; use
    // a 1-element array column directly
    val gen = viaGen.select(col("doc_id"),
        CdcChunks.chunks(array(col("text")), w = 1, divisor = 2)
          .as(Seq("chunk_idx", "n_toks", "chunk")))
      .orderBy("doc_id").select("chunk").as[String].collect().toSeq
    // w=1, divisor=2: cut after token iff h60 % 2 == 0 — compare chunk
    // layout against the SQL-computed hashes' parity
    assert(gen == tokens) // single-token docs are always exactly one chunk
    // and parity of the boundary decision: a doc of the token repeated
    // twice yields 2 chunks iff h60(token) % 2 == 0 (cut after token 1)
    val two = tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("doc_id"),
        CdcChunks.chunks(array(col("text"), col("text")), w = 1, divisor = 2)
          .as(Seq("chunk_idx", "n_toks", "chunk")))
      .groupBy("doc_id").count()
      .orderBy("doc_id").as[(Long, Long)].collect().map(_._2).toSeq
    val expected = viaSql.map(h => if (h % 2 == 0) 2L else 1L)
    assert(two == expected)
  }

  test("rolling boundary hash equals the brute-force BigInt polynomial") {
    val w = 4
    val divisor = 16
    val n = 300
    val toks = (1 to n).map(i => s"tk${(i * 2654435761L) % 991}-$i")
    // independent reference: h60 via Spark SQL (the oracle's definition),
    // window hash via BigInt — no wrapping arithmetic anywhere
    val h60 = toks.toDF("t").select(PortableHash.hash60(col("t")).as("h"))
      .as[Long].collect()
    val mod = BigInt(1) << 60
    val cuts = (w to n).filter { i => // 1-based boundary positions
      val hw = (0 until w).map { j =>
        BigInt(h60(i - 1 - j)) * BigInt(CdcChunks.powerMod(j))
      }.sum.mod(mod)
      hw % divisor == 0
    }
    val refCuts = if (cuts.lastOption.contains(n)) cuts else cuts :+ n
    val refNtoks = refCuts.zip(0 +: refCuts.init).map { case (c, p) => (c - p).toLong }
    val got = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      .select(CdcChunks.chunks(split(col("text"), " "), w, divisor)
        .as(Seq("chunk_idx", "n_toks", "chunk")))
      .orderBy("chunk_idx")
      .as[(Int, Long, String)].collect()
    assert(got.map(_._2).toSeq == refNtoks, "chunk token counts must match reference cuts")
    assert(got.map(_._3).mkString(" ") == toks.mkString(" "), "chunks must partition the doc")
    assert(got.length >= 3, s"degenerate test: only ${got.length} chunks — raise n")
  }

  test("null array yields no rows; short docs yield one whole-doc chunk") {
    val df = Seq((1L, Some("a b c")), (2L, None)).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        CdcChunks.chunks(split(col("text"), " "), w = 4, divisor = 16)
          .as(Seq("chunk_idx", "n_toks", "chunk")))
      .as[(Long, Int, Long, String)].collect()
    assert(out.toSeq == Seq((1L, 0, 3L, "a b c")))
  }
}
