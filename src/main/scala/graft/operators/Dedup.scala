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
    * Tokenizes ONCE into a named column, then streams distinct grams with
    * the native [[graft.functions.expressions.DistinctGrams]] generator —
    * the HOF `explode(array_distinct(transform(...)))` form it replaces
    * materialized two transient arrays per document and ran an interpreted
    * (CodegenFallback) lambda per position, which dominated the COLD cost
    * of every shingle consumer. The [[Partitions.widen]] exchange fans a
    * small single-row-group scan out across the executors before the
    * expensive stage. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__ws"))
    Partitions.widen(toks, col(idCol))
      .select(col(idCol),
        graft.functions.expressions.DistinctGrams.grams(col("__ws"), n).as(Seq("gram")))
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

  /** N-gram CONTAINMENT pairs — the asymmetric cousin of [[jaccardPairs]]:
    * containment(A→B) = |A∩B| / |A| (Broder's "resemblance vs containment"
    * split, 1997). Jaccard misses the quote/aggregator pattern — a short
    * document wholly embedded in a much longer one scores near-zero
    * Jaccard (union is huge) but containment 1.0 from the short side.
    * Output: (id_a, id_b, containment_a, containment_b) with id_a < id_b,
    * kept when EITHER direction ≥ threshold.
    *
    * Scale shape: identical to [[jaccardPairs]] — one shingle equi-join
    * for candidates (linear in shared-gram pairs, hot shingles capped),
    * sizes from the same capped relation so both directions see one
    * shingle universe. */
  def containmentPairs(
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
    val sizes = shCapped.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    val inter = shCapped.as("a")
      .join(shCapped.as("b"),
        col("a.gram") === col("b.gram") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_grams").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_grams").as("n_b")), "id_b")
      .withColumn("containment_a",
        round(col("n_inter").cast("double") / col("n_a"), 6))
      .withColumn("containment_b",
        round(col("n_inter").cast("double") / col("n_b"), 6))
      .filter(col("containment_a") >= threshold || col("containment_b") >= threshold)
      .select("id_a", "id_b", "containment_a", "containment_b")
  }

  /** Edit-distance (Levenshtein) near-duplicate pairs: id_a < id_b with
    * dist ≤ `maxDist`. Candidates come from the shared-shingle equi-join —
    * LINEAR in shared-gram pairs, never |docs|² — then a cheap length-band
    * filter (|len_a − len_b| ≤ maxDist is necessary for ed ≤ maxDist) gates
    * the exact O(L·maxDist)-ish levenshtein refine.
    *
    * Losslessness: one character edit perturbs one word, which touches at
    * most n word-n-grams (n+1 if the edit adds/removes a space), so any
    * pair at distance ≤ maxDist whose docs carry more than maxDist·(n+1)
    * distinct shingles MUST still share one — candidate generation misses
    * nothing above that size floor. `maxGramFreq` caps hot-shingle fan-out
    * at corpus scale (same skew guard as [[jaccardPairs]]).
    *
    * NOTE: Spark's `levenshtein` counts UTF-16 characters; engines that
    * count bytes (e.g. DuckDB) agree only on ASCII text — normalize or
    * transliterate first when comparing mixed-script corpora across
    * engines. */
  def editDistancePairs(
      df: DataFrame, idCol: String, textCol: String, maxDist: Int,
      n: Int = 5, maxGramFreq: Int = Int.MaxValue): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val shCapped =
      if (maxGramFreq == Int.MaxValue) sh
      else {
        val hot = sh.groupBy("gram").agg(count(lit(1)).as("f"))
          .filter(col("f") > maxGramFreq).select("gram")
        sh.join(broadcast(hot), Seq("gram"), "left_anti")
      }
    val cand = shCapped.as("a")
      .join(shCapped.as("b"),
        col("a.gram") === col("b.gram") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val txt = df.select(col(idCol), col(textCol))
    cand
      .join(txt.select(col(idCol).as("id_a"), col(textCol).as("__ta")), "id_a")
      .join(txt.select(col(idCol).as("id_b"), col(textCol).as("__tb")), "id_b")
      .filter(abs(length(col("__ta")) - length(col("__tb"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__ta"), col("__tb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Global boilerplate removal (the C4-style cleanup): split every
    * document into consecutive `window`-word chunks, count each distinct
    * chunk's DOCUMENT frequency corpus-wide, drop chunks appearing in more
    * than `maxDocFreq` documents (navigation bars, license footers, cookie
    * banners — content repeated verbatim across unrelated pages), and
    * reassemble the survivors in original order.
    *
    * Scale shape: chunking is a per-row transform (no shuffle); the
    * frequency count is one hash aggregation on the chunk; the hot set —
    * by construction the globally-REPEATED chunks, a tiny fraction of the
    * corpus — broadcasts into a left-anti join, so the corpus-sized chunk
    * relation never shuffles for the filter; reassembly is one aggregation
    * on the doc id. Documents whose every chunk was boilerplate drop out
    * of the result (callers wanting empty rows can left-join back).
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      window: Int, maxDocFreq: Long): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__ws"))
    val chunkArr = when(size(col("__ws")) > 0,
      transform(
        sequence(lit(0), ceil(size(col("__ws")) / lit(window.toDouble)).cast("int") - 1),
        i => concat_ws(" ", slice(col("__ws"), i * window + 1, lit(window)))))
      .otherwise(array().cast("array<string>"))
    val chunks = Partitions.widen(toks, col(idCol))
      .select(col(idCol), posexplode(chunkArr).as(Seq("pos", "chunk")))
    val hot = chunks.groupBy("chunk")
      .agg(count_distinct(col(idCol)).as("df"))
      .filter(col("df") > maxDocFreq).select("chunk")
    chunks.join(broadcast(hot), Seq("chunk"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
          x => x("chunk")), " ").as("clean_text"))
  }

  /** MinHash signatures: array of `numHashes` minimum hash values over the
    * document's shingle set. Default hash family h_i(g) = xxhash64(i, g) —
    * seeded by the leading literal, so each i is an independent 64-bit
    * function. `portable = true` switches to the md5-derived 60-bit family
    * ([[graft.functions.PortableHash]]) that DuckDB can reproduce — slower,
    * identical semantics, used by the oracle-checked driver queries.
    * One shuffle (groupBy id), map-side combinable. */
  def minHashSignatures(
      df: DataFrame, idCol: String, textCol: String, n: Int, numHashes: Int,
      portable: Boolean = false): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    // portable path hashes each gram ONCE (md5 is the expensive step) and
    // derives the family members by multiply-shift — 64 md5s per gram
    // measured ~15× slower end-to-end at sf0.1
    val base =
      if (portable) sh.withColumn("__gh", graft.functions.PortableHash.hash60(col("gram")))
      else sh
    val mins = (0 until numHashes).map { i =>
      val h = if (portable) graft.functions.PortableHash.family60(col("__gh"), i)
              else xxhash64(lit(i), col("gram"))
      min(h).as(s"h$i")
    }
    base.groupBy(idCol)
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** MinHash + LSH candidate pairs with signature-estimated Jaccard.
    * `bands` × (numHashes/bands) banding; a pair becomes a candidate if any
    * band hashes equal; estimate = fraction of equal signature components.
    * Candidate generation is an equi-join on (band, bandKey) — linear
    * shuffle volume, the scale path for corpus dedup.
    *
    * Band key: default compresses each band to 8 bytes via xxhash64 (what
    * you want at 100 TB — fixed-width shuffle key, collision odds 2⁻⁶⁴);
    * `portable = true` joins on the exact comma-joined band values instead
    * (strings, slightly wider shuffle) so the DuckDB oracle is exact — no
    * cross-engine hash needed and no collision caveat. */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      numHashes: Int, bands: Int, threshold: Double,
      portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sig = minHashSignatures(df, idCol, textCol, n, numHashes, portable)
    val bandKey = (b: org.apache.spark.sql.Column) => {
      val bandVals = slice(col("signature"), b * rows + 1, lit(rows))
      if (portable) array_join(transform(bandVals, v => v.cast("string")), ",")
      else xxhash64(b, bandVals)
    }
    val banded = sig.select(
      col(idCol), col("signature"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bandKey)))
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

  /** SimHash over word tokens: bit i of the result is 1 iff the sum of ±1
    * contributions (per-token hash bit i) is positive. Expressed as one
    * conditional-sum aggregate per bit — fully codegen'd, map-side
    * combinable, one shuffle on id. Integer arithmetic throughout, so the
    * fingerprint is bit-identical across engines and runs.
    *
    * Width follows the hash family: 64 bits on the default xxhash64 family,
    * [[graft.functions.PortableHash.Bits]] (60) on the md5-derived portable
    * family — use [[simHashBits]] when deriving block geometry. */
  def simHash(df: DataFrame, idCol: String, textCol: String,
      portable: Boolean = false): DataFrame = {
    val bits = simHashBits(portable)
    val tok = Partitions.widen(
        df.select(col(idCol), Text.tokens(col(textCol)).as("__ws")), col(idCol))
      .select(col(idCol), explode(col("__ws")).as("w"))
      .withColumn("h",
        if (portable) graft.functions.PortableHash.hash60(col("w")) else xxhash64(col("w")))
    val bitSums = (0 until bits).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"b$i")
    }
    val agged = tok.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until bits)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    agged.select(col(idCol), simhash.as("simhash"))
  }

  /** Fingerprint width of [[simHash]] for the given family. */
  def simHashBits(portable: Boolean): Int =
    if (portable) graft.functions.PortableHash.Bits else 64

  /** Candidate generation + verification for SimHash near-dup over a
    * precomputed (id, simhash) relation — the generalized permuted-block
    * design of Manku, Jain & Sarma ("Detecting near-duplicates for web
    * crawling", WWW 2007, §3), expressed as equi-joins.
    *
    * Split the `bits`-wide fingerprint into `blocks` contiguous blocks
    * (widths as even as possible). A pair within Hamming distance k differs
    * in at most k blocks, so it agrees EXACTLY on at least `blocks − k`.
    * Build one join group per `blocksPerKey`-sized combination of blocks,
    * keyed on the concatenated block values; completeness holds whenever
    * `blocksPerKey ≤ blocks − maxHamming` (some combination then lies
    * entirely inside the agreeing set) — enforced here, so the output is
    * exactly all pairs with hamming ≤ maxHamming regardless of geometry.
    *
    * WHY the knobs matter at 100 TB: the plain pigeonhole (blocks = k+1,
    * blocksPerKey = 1) gives keys of only bits/(k+1) bits — at k=7 that is
    * 8-bit keys → 256 buckets → per-bucket candidate lists grow ~N/256 and
    * the join degenerates quadratic. Raising `blocks`/`blocksPerKey` widens
    * the key: e.g. bits=60, blocks=9, blocksPerKey=2 keeps k=7 complete
    * with ~13-bit keys and C(9,2)=36 join groups — candidate volume per
    * group drops by 2^6 while total fan-out grows only 4.5×, and every
    * group is still an equi-join (linear shuffle). Expected random-collision
    * candidates ≈ C(blocks, r) · N² / 2^keyBits — choose geometry so that
    * stays ~O(N) at your corpus size. */
  def simHashCandidates(
      sig: DataFrame, idCol: String, maxHamming: Int, bits: Int = 64,
      blocks: Int = 0, blocksPerKey: Int = 1): DataFrame = {
    val chunked = candidateKeys(sig, idCol, maxHamming, bits, blocks, blocksPerKey)
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.grp") === col("b.grp") && col("a.grp_key") === col("b.grp_key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** The exploded (id, simhash, grp, grp_key) relation [[simHashCandidates]]
    * self-joins on (grp, grp_key). Exposed within graft so the scale spec
    * can assert the candidate-join volume (Σ per-bucket n·(n−1)/2) of a
    * geometry analytically, without materializing the join. */
  private[graft] def candidateKeys(
      sig: DataFrame, idCol: String, maxHamming: Int, bits: Int,
      blocks: Int, blocksPerKey: Int): DataFrame = {
    val m = if (blocks > 0) blocks else maxHamming + 1
    require(m > maxHamming, s"need more than maxHamming=$maxHamming blocks, got $m")
    require(blocksPerKey >= 1 && blocksPerKey <= m - maxHamming,
      s"blocksPerKey must be in [1, blocks - maxHamming] for completeness " +
        s"(got $blocksPerKey with blocks=$m, maxHamming=$maxHamming)")
    // block j covers [offsets(j), offsets(j+1)) — widths differ by ≤1
    val offsets = (0 to m).map(j => j * bits / m)
    val width = (j: Int) => offsets(j + 1) - offsets(j)
    val blockVal = (j: Int) => {
      // (1L << 64) wraps to 1L in JVM shift semantics, so a full-width
      // block (maxHamming=0 with the 64-bit family) needs an explicit
      // all-ones mask
      val mask = if (width(j) >= 64) -1L else (1L << width(j)) - 1L
      shiftright(col("simhash"), offsets(j)).bitwiseAND(lit(mask))
    }
    // one packed long key per combination of blocks (total width ≤ 60 bits
    // in any sane multi-block geometry; a single-block key is the block
    // value itself, so it may occupy the full 64 bits — maxHamming=0 over
    // the 64-bit family is exactly that case)
    val combos = (0 until m).combinations(blocksPerKey).toSeq
    require(combos.forall(c => c.size == 1 || c.map(width).sum <= 60),
      "combined key width exceeds 60 bits — lower blocksPerKey or raise blocks")
    val keyExprs = combos.map(c =>
      c.foldLeft(lit(0L): org.apache.spark.sql.Column)((acc, j) =>
        shiftleft(acc, width(j)).bitwiseOR(blockVal(j))))
    sig.select(
      col(idCol), col("simhash"),
      posexplode(array(keyExprs: _*)))
      .withColumnRenamed("pos", "grp")
      .withColumnRenamed("col", "grp_key")
  }

  /** SimHash near-duplicate pairs within Hamming distance `maxHamming`:
    * [[simHash]] + [[simHashCandidates]]. Defaults reproduce the plain
    * pigeonhole (blocks = maxHamming+1, one block per key); pass a wider
    * geometry for corpus scale — see [[simHashCandidates]]. Output is the
    * exact pair set either way. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int,
      blocks: Int = 0, blocksPerKey: Int = 1, portable: Boolean = false): DataFrame =
    simHashCandidates(simHash(df, idCol, textCol, portable), idCol, maxHamming,
      simHashBits(portable), blocks, blocksPerKey)
}
