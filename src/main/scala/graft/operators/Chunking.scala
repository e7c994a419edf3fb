package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the retrieval/context-window
  * splitter of an LLM data pipeline (RAG indexing, long-document
  * training prep): each document becomes ⌈(n − chunk)/stride⌉ + 1
  * windows of `chunkTokens` whitespace tokens advancing by `stride`
  * (overlap = chunkTokens − stride), the final window keeping whatever
  * tail remains.
  *
  * Pure narrow plan: split → per-row chunk count (integer arithmetic) →
  * `explode(sequence)` fan-out → `slice`/`array_join` — NO shuffle at
  * all; chunking parallelizes embarrassingly at any scale and the
  * fan-out per row is bounded by the document's own length. Contrast
  * [[Packing]], which solves the opposite problem (many short docs →
  * fixed-size training sequences) and needs per-group windows.
  */
object Chunking {

  /** (idCol, chunk_idx, chunk) — `chunk` is the space-joined token
    * window; empty/short docs yield exactly one chunk. */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
      s"need 1 <= stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    df.select(col(idCol), split(col(textCol), " ").as("__ws"))
      .withColumn("__n", size(col("__ws")).cast("long"))
      // ⌈(n − chunk)/stride⌉ + 1 in integer arithmetic (n > chunk), else 1
      .withColumn("__nc",
        when(col("__n") <= chunkTokens, lit(1L))
          .otherwise(expr(s"(__n - $chunkTokens + ${stride - 1}) div $stride + 1")))
      .select(col(idCol), col("__ws"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_idx"))
      .withColumn("chunk", array_join(
        slice(col("__ws"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkTokens)),
        " "))
      .drop("__ws")
  }

  /** Content-defined chunking — boundaries decided by the CONTENT, not by
    * position (Muth-Manber anchoring as used by LBFS/rsync/FastCDC, at
    * token granularity): cut after token `i` whenever the rolling
    * `w`-token window ending at `i` hashes to `0 mod divisor`. Insert or
    * delete one token and only the chunks around the edit change — every
    * other boundary re-synchronizes, which is what makes CDC the right
    * chunker for dedup of SHIFTED content (fixed windows misalign the
    * whole tail; [[tokenChunks]] is the retrieval splitter, this is the
    * dedup splitter). Expected chunk length ≈ `divisor` tokens.
    *
    * This is the bound-free Muth-Manber form: no min/max chunk clamps.
    * Production CDC adds them to bound the chunk-size tail, but the
    * clamps make boundary `i` depend on boundary `i-1` (a sequential
    * per-doc scan); the pure content-local predicate keeps the operator
    * a narrow, shuffle-free plan. The chunk-size distribution is
    * geometric — bound it by choice of `divisor`.
    *
    * Output: (idCol, chunk_idx, n_toks, chunk_md5) — chunks are emitted
    * as md5 fingerprints (the dedup-join key), not text, so nothing wide
    * leaves the row. Docs shorter than `w` tokens are one whole-doc
    * chunk. The boundary hash is a rolling polynomial over PER-TOKEN
    * md5-derived 60-bit values ([[graft.functions.expressions.CdcChunks]]
    * — O(1) per token, not O(w) per window), every constant shared with
    * the SQL oracle so it reproduces every cut with HUGEINT arithmetic.
    *
    * Scale shape: one native streaming generator (scan → generate →
    * project) — NO shuffle, no state, no interpreted lambdas;
    * embarrassingly parallel like [[tokenChunks]] with a strictly
    * smaller constant (the previous HOF form paid an interpreted O(w)
    * slice+concat+md5 per token window — the repo's top bench cost).
    */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      w: Int, divisor: Int): DataFrame = {
    require(w >= 1, "window must be >= 1 token")
    require(divisor >= 2, "divisor < 2 cuts after every token")
    df.select(col(idCol),
        graft.functions.expressions.CdcChunks
          .chunks(split(col(textCol), " "), w, divisor)
          .as(Seq("chunk_idx", "n_toks", "__chunk")))
      .select(col(idCol), col("chunk_idx"), col("n_toks"),
        md5(col("__chunk")).as("chunk_md5"))
  }
}
