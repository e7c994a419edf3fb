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
}
