package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that share
  * long word n-grams with an evaluation/benchmark corpus — the standard
  * guard against test-set leakage into a training set (the n-gram-overlap
  * family popularized by the GPT-2/GPT-3 and C4 dataset reports; long
  * shingles make coincidental overlap vanishingly rare).
  *
  * Scale shape: the benchmark side is tiny (thousands of docs) next to a
  * 100 TB training corpus, so its (gram → bench_id) relation is BROADCAST —
  * the training-corpus shingle scan never shuffles for candidate discovery;
  * the only exchange is the final (train_id, bench_id) count aggregation,
  * which is bounded by actually-overlapping pairs, not corpus size. With
  * `broadcastBench = false` it degrades gracefully to a shuffle equi-join
  * on the gram (still linear in shared-gram pairs — never |train|×|bench|).
  */
object Decontaminate {

  /** Overlap report: one row per (train doc, bench doc) pair sharing at
    * least `minShared` DISTINCT n-gram shingles, with the shared count.
    * Output: train_id, bench_id, shared_grams. */
  def overlapReport(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Long,
      broadcastBench: Boolean = true): DataFrame = {
    // Join on the 8-byte xxhash64 of the shingle, not the shingle string:
    // an n=5+ word gram averages tens of bytes, and the gram bytes would
    // otherwise ride through the widen exchange, the broadcast, the join
    // hash table, and the pair aggregate. Hashing first shrinks every one
    // of those structures ~4-8× (measured locally: most of the query's
    // heap working set). A 64-bit collision between DISTINCT grams of one
    // (train, bench) pair — the only event that could perturb a shared
    // count — has probability ~(grams/doc)²/2⁶⁴ ≈ 1e-15; the benchmark
    // membership decision tolerates it by construction (minShared is a
    // heuristic threshold, same as every hashed-shingle dedup tier).
    val tg = Dedup.shingles(train, idCol, textCol, n)
      .select(col(idCol).as("train_id"), xxhash64(col("gram")).as("gram_h"))
    val bg0 = Dedup.shingles(bench, idCol, textCol, n)
      .select(col(idCol).as("bench_id"), xxhash64(col("gram")).as("gram_h"))
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    tg.join(bg, "gram_h")
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
  }

  /** The training set with every contaminated document removed (left-anti
    * on the overlap report's train ids). Keeps all train columns. */
  def clean(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Long,
      broadcastBench: Boolean = true): DataFrame = {
    val bad = overlapReport(train, bench, idCol, textCol, n, minShared, broadcastBench)
      .select(col("train_id").as(idCol)).distinct()
    train.join(bad, Seq(idCol), "left_anti")
  }
}
