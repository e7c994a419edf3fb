package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus deduplication operators for large-scale training-data pipelines.
  *
  * Scale notes (the design constraint, not an afterthought):
  *  - exact dedup is a single hash-shuffle on a 16-byte content key — never
  *    shuffle full document text at 100 TB;
  *  - exact n-gram Jaccard joins on the (doc, shingle) relation, so cost is
  *    proportional to shared-shingle pairs, not |docs|²; hot shingles are
  *    frequency-capped to bound skew;
  *  - MinHash+LSH replaces the all-pairs comparison with banded bucket
  *    joins: candidate generation is linear in corpus size, verification is
  *    linear in candidates — this is the 100 TB path;
  *  - SimHash near-dup uses the pigeonhole chunk trick so pairs within
  *    Hamming distance k are found with k+1 equi-joins, no cross join.
  *
  * Technique provenance (public literature): MinHash — Broder, "On the
  * resemblance and containment of documents" (SEQUENCES 1997); LSH
  * banding — Indyk & Motwani (STOC 1998) / Leskovec-Rajaraman-Ullman,
  * "Mining of Massive Datasets" ch.3; SimHash — Charikar, "Similarity
  * estimation techniques from rounding algorithms" (STOC 2002) and
  * Manku et al., "Detecting near-duplicates for web crawling" (WWW 2007)
  * for the pigeonhole chunk search.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct text with the surviving
    * (minimum) id and the duplicate count. Shuffles only (md5 key, id) —
    * the text column itself never crosses the wire. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), Text.contentKey(col(textCol)).as("content_key"))
      .groupBy("content_key")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: keep the minimum-id row per distinct text. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = exactGroups(df, idCol, textCol).select(col("keeper_id").as(idCol))
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** The (id, shingle) relation: distinct word n-grams per document.
    *
    * Tokenizes ONCE into a named column before deriving grams — inlining
    * `split` into the per-position gram lambda re-splits the text for
    * every position (O(tokens²) interpreted work per doc; HOF lambdas are
    * CodegenFallback). The [[Partitions.widen]] exchange also fans a
    * small single-row-group scan out across the executors before the
    * expensive stage. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__ws"))
    Partitions.widen(toks, col(idCol))
      .select(col(idCol), explode(Text.nGramsFromTokens(col("__ws"), n)).as("gram"))
  }

  /** Exact n-gram Jaccard near-duplicate pairs (id_a < id_b, similarity ≥
    * threshold). `maxGramFreq` drops shingles shared by more than that many
    * documents before the self-join — they contribute little to Jaccard but
    * dominate the join fan-out (skew cap for scale); pass Int.MaxValue for
    * the exact-oracle configuration. */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxGramFreq: Int = Int.MaxValue): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val shCapped =
      if (maxGramFreq == Int.MaxValue) sh
      else {
        val hot = sh.groupBy("gram").agg(count(lit(1)).as("f"))
          .filter(col("f") > maxGramFreq).select("gram")
        sh.join(broadcast(hot), Seq("gram"), "left_anti")
      }
    // Sizes come from the SAME (possibly frequency-capped) relation as the
    // intersection, so numerator and denominator see one shingle universe —
    // capping then redefines Jaccard over the capped universe instead of
    // silently underestimating it (one-sided bias otherwise).
    val sizes = shCapped.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    val inter = shCapped.as("a")
      .join(shCapped.as("b"),
        col("a.gram") === col("b.gram") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_grams").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_grams").as("n_b")), "id_b")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures: array of `numHashes` minimum hash values over the
    * document's shingle set. Hash family h_i(g) = xxhash64(i, g) — seeded by
    * the leading literal, so each i is an independent 64-bit function.
    * One shuffle (groupBy id), map-side combinable. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String, n: Int, numHashes: Int): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), col("gram"))).as(s"h$i"))
    sh.groupBy(idCol)
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** MinHash + LSH candidate pairs with signature-estimated Jaccard.
    * `bands` × (numHashes/bands) banding; a pair becomes a candidate if any
    * band hashes equal; estimate = fraction of equal signature components.
    * Candidate generation is an equi-join on (band, bandHash) — linear
    * shuffle volume, the scale path for corpus dedup. */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sig = minHashSignatures(df, idCol, textCol, n, numHashes)
    val banded = sig.select(
      col(idCol), col("signature"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("signature"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.signature").as("sig_a"), col("b.signature").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("est_jaccard",
        round(
          aggregate(
            zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes),
          6))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 64-bit SimHash over word tokens: bit i of the result is 1 iff the sum
    * of ±1 contributions (per-token xxhash64 bit i) is positive. Expressed
    * as 64 conditional-sum aggregates — fully codegen'd, map-side
    * combinable, one shuffle on id. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = Partitions.widen(
        df.select(col(idCol), Text.tokens(col(textCol)).as("__ws")), col(idCol))
      .select(col(idCol), explode(col("__ws")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"b$i")
    }
    val agged = tok.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    agged.select(col(idCol), simhash.as("simhash"))
  }

  /** SimHash near-duplicate pairs within Hamming distance `maxHamming`.
    * Pigeonhole: split 64 bits into maxHamming+1 chunks; any pair within
    * distance k must agree exactly on ≥1 chunk → k+1 equi-joins on chunk
    * value instead of a cross join. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val sh = simHash(df, idCol, textCol)
    val chunked = sh.select(
      col(idCol), col("simhash"),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("simhash"), c * width)
          .bitwiseAND(lit(if (width >= 64) -1L else (1L << width) - 1))
      }: _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }
}
