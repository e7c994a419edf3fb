package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Byte-pair-encoding tokenizer: train merges from corpus statistics and
  * apply them at scale (Sennrich et al., "Neural Machine Translation of
  * Rare Words with Subword Units", ACL 2016 — char-level with the `</w>`
  * end-of-word marker).
  *
  * Scale split, mirroring how production tokenizer trainers work:
  * - the CORPUS pass (word frequencies) is a distributed map-side-combined
  *   aggregation + TakeOrdered — the cluster sees every byte, the driver
  *   receives only the top-V word vocabulary (bounded, documented driver
  *   state, same class as the IVF codebook);
  * - the MERGE LOOP runs on the driver over that vocabulary — it is
  *   O(vocab · merges), data-scale-independent, and inherently sequential
  *   (merge i+1's statistics depend on merge i);
  * - ENCODING broadcasts the rank table and streams documents through a
  *   per-partition greedy encoder — embarrassingly parallel, no shuffle.
  *
  * The iterative rank-greedy apply is not SQL-expressible, so this
  * operator is spec-verified (reference-implementation equivalence,
  * priority order, partition independence) rather than oracle-backed; the
  * trainer's corpus statistics ARE oracle-backed via the term-stats
  * queries (`bpe_pair_stats`, `term_corpus_freq` family). */
object Bpe {

  private val EndOfWord = "</w>"

  /** Distributed corpus pass: top-`topV` words by (freq DESC, word ASC).
    * The only rows the driver ever holds. */
  def wordFrequencies(docs: DataFrame, idCol: String, textCol: String, topV: Int): Seq[(String, Long)] =
    docs.select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(topV)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  /** Driver-side merge loop over the bounded vocabulary. Deterministic:
    * ties on pair count break lexicographically. Returns merges in rank
    * order (earlier = higher priority). */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Array[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toArray :+ EndOfWord, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
        merges += best
        words = words.map { case (syms, f) => (mergePair(syms, best), f) }
      }
    }
    merges.toSeq
  }

  /** Merge every non-overlapping left-to-right occurrence of `pair`. */
  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy BPE apply: repeatedly merge the present pair with the LOWEST
    * rank until none of the learned pairs remains. Exactly the reference
    * algorithm — priority comes from training order, not position. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = word.map(_.toString).toArray :+ EndOfWord
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = mergePair(syms, best)
    }
    syms
  }

  /** (id, subtokens, n_subtokens) per document: whitespace words, each
    * greedily encoded with the broadcast rank table. Pure per-partition
    * map — no shuffle, plan stays embarrassingly parallel. */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val ranksBc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val narrowed = docs.select(col(idCol), col(textCol))
    val outSchema = new org.apache.spark.sql.types.StructType()
      .add(idCol, narrowed.schema.head.dataType)
      .add("subtokens", ArrayType(StringType))
      .add("n_subtokens", LongType)
    narrowed.mapPartitions { rows =>
      val ranks = ranksBc.value
      rows.map { r =>
        val text = Option(r.getString(1)).getOrElse("")
        val subs = text.split(" ").iterator.filter(_.nonEmpty)
          .flatMap(w => encodeWord(w, ranks)).toArray
        org.apache.spark.sql.Row(r.get(0), subs.toSeq, subs.length.toLong)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
