package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing: the GPT-style pretraining layout
  * where documents are concatenated in a deterministic order (one
  * separator/EOS token after each doc) and the resulting token stream is
  * sliced into fixed-length training sequences. This operator computes the
  * packing PLAN — each document's global token offset and the range of
  * sequence ids it lands in — without materializing any token stream, so a
  * downstream writer can cut shards independently: a shard writer owning
  * sequences [a, b) needs exactly the docs with `first_seq < b` and
  * `first_seq + n_seqs > a`.
  *
  * Scale shape (the reason this isn't one global window): a window
  * partitioned by `groupCol` computes within-group running offsets — big,
  * but parallel across groups — while group base offsets come from a
  * per-group aggregate (ONE row per group) ordered by a tiny unpartitioned
  * window and broadcast back. No global sort, and no single partition ever
  * holds row-scale data; the only single-partition step is over the
  * group-count-sized totals table. Offsets are exact 64-bit integers
  * (`div`, not `/` — double division mis-floors past 2^53, reachable at
  * 100 TB token counts).
  *
  * Cost note: `nTokens` is evaluated in BOTH plan branches (the per-doc
  * window side and the per-group totals side) — Catalyst does not CSE
  * across join inputs. That is fine when it is a cheap column; when it is
  * a tokenizer over raw text, pass a frame with the count already
  * materialized (every corpus pipeline has a doc-stats table) so the
  * totals branch reads one long column instead of re-tokenizing 100 TB.
  */
object Packing {

  /** Packing plan for sequences of `seqLen` tokens. Documents are laid out
    * ordered by (`groupCol`, `idCol`); each contributes `nTokens + 1`
    * stream positions (trailing separator). Output: idCol, groupCol,
    * n_tokens, start_off (global token offset of the doc's first token),
    * first_seq (sequence index containing it) and n_seqs (how many
    * sequences the doc spans — boundary docs straddle, as in standard
    * pretraining packing). */
  def chunkPlan(docs: DataFrame, idCol: String, groupCol: String,
      nTokens: Column, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val base = docs
      .select(col(idCol), col(groupCol), nTokens.cast("long").as("n_tokens"))
      .withColumn("__len", col("n_tokens") + lit(1L))
    val wGrp = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inGrp = base.withColumn("__in_end", sum("__len").over(wGrp))
    // one row per group; running total over groups = each group's base
    val wGroups = Window.orderBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(groupCol).agg(sum("__len").as("__tot"))
      .withColumn("__base", coalesce(sum("__tot").over(wGroups), lit(0L)))
      .select(col(groupCol), col("__base"))
    inGrp.join(broadcast(offsets), Seq(groupCol))
      .withColumn("start_off", col("__base") + col("__in_end") - col("__len"))
      .withColumn("first_seq", expr(s"start_off div $seqLen"))
      .withColumn("n_seqs",
        expr(s"(start_off + __len - 1) div $seqLen") - col("first_seq") + lit(1L))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        col("start_off"), col("first_seq"), col("n_seqs"))
  }
}
