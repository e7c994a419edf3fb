package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: TF-IDF scoring and top-terms-per-document —
  * the keyword-extraction primitive of a text pipeline (Salton & Buckley's
  * term-weighting family; the smoothed idf is the `ln((1+N)/(1+df)) + 1`
  * variant, always positive so unseen-term smoothing never zeroes a score).
  *
  * Scale shape: two hash aggregations (term-frequency on (doc, term),
  * document-frequency on term) and one shuffle equi-join on the term — the
  * vocabulary side is NOT assumed broadcastable (at 100 TB it isn't). The
  * corpus size N rides along as a broadcast single-row frame, and the final
  * per-doc top-k is a row_number window that Spark executes with
  * WindowGroupLimit pushdown (each partition keeps k rows before the sort).
  *
  * Scores are emitted as integer micro-units (`floor(x·1e6 + 0.5)`) — the
  * engine-portable quantization used across graft: ln differs by ulps
  * between libm implementations, and ranking on the quantized integer makes
  * the top-k cutoff identical on every engine.
  */
object TermStats {

  /** (id, term, tf) — raw whitespace terms, repeats counted. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), Text.tokens(col(textCol)).as("__ws"))
      .select(col(idCol), explode(col("__ws")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** Adjacent-token pair counts — the statistic behind one BPE merge step
    * (Sennrich et al., "Neural Machine Translation of Rare Words with
    * Subword Units", ACL 2016, at token rather than byte granularity): the
    * most frequent adjacent pair is the next merge a tokenizer trainer
    * would pick. Output: the top `k` pairs as (left, right, n_pairs, rank),
    * rank by (count DESC, left ASC, right ASC) — fully deterministic.
    *
    * Scale shape: pair generation is a per-row lambda over the token array
    * (no join), the count is one map-side-combinable hash aggregation on
    * the pair, and the global top-k is a TakeOrderedAndProject — the
    * driver receives k rows, never the pair distribution. One full BPE
    * training run is this operator iterated with re-tokenization between
    * merges; each iteration is the same linear pass. */
  def topAdjacentPairs(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(col(idCol), Text.tokens(col(textCol)).as("__ws"))
    val pairs = Partitions.widen(toks, col(idCol))
      .filter(size(col("__ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__ws")) - 2),
        i => struct(
          element_at(col("__ws"), i + 1).as("left"),
          element_at(col("__ws"), i + 2).as("right")))).as("__p"))
      .select(col("__p.left").as("left"), col("__p.right").as("right"))
    pairs.groupBy("left", "right")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("left").asc, col("right").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(
          col("n_pairs").desc, col("left").asc, col("right").asc)))
  }

  /** Corpus-frequency document scores — the exact-integer surrogate for
    * unigram language-model scoring: per document, the total token count,
    * the global frequency of its RAREST token, and the mean global token
    * frequency in micro-units. Rare-token documents (low min_tf) are
    * gibberish/OCR-noise candidates; very-common-token documents (high
    * mean_tf) are boilerplate candidates. All-integer arithmetic until one
    * final IEEE division, so the scores are bit-identical across engines
    * (a true log-prob LM score would hang portability on libm ulps).
    *
    * Scale shape: tokens pre-aggregate to (doc, term, tf) BEFORE the
    * vocabulary join — fan-out is bounded by distinct terms per doc, not
    * occurrences — and the global frequencies come from a COUNT window
    * over the term partition of that same relation (one scan; a joined-
    * back aggregate would tokenize the corpus twice — same reasoning as
    * [[topTerms]]). Hot terms ("the") skew the term shuffle; AQE's skew
    * handling or salting the window key covers that at 100 TB. */
  def corpusFrequencyScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val withGlobal = tf.withColumn("__gtf",
      sum(col("tf")).over(Window.partitionBy("term")))
    withGlobal.groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        min(col("__gtf")).as("min_tf"),
        sum(col("tf") * col("__gtf")).as("sum_tf"))
      .withColumn("mean_tf_e6",
        floor(col("sum_tf").cast("double") / col("n_tokens").cast("double")
          * 1e6 + 0.5).cast("long"))
  }

  /** Vocabulary coverage / out-of-vocabulary rate — the statistic a
    * tokenizer designer reads before fixing a vocab size: build the top-`v`
    * corpus vocabulary (by total occurrences, ties broken by term ASC) and
    * report, per document, how many tokens fall outside it. High OOV rate
    * under a candidate vocab means UNK-flooding at training time; the same
    * scan also powers coverage-vs-size curves (run with several `v`).
    *
    * Output: (id, n_tokens, oov_tokens, oov_e6) — oov_e6 is the OOV
    * fraction in integer micro-units (exact integers + one IEEE division,
    * engine-portable; n_tokens ≥ 1 always, whitespace split of "" is [""]).
    *
    * Scale shape: one (doc, term, tf) hash aggregation (map-side
    * combinable — tokens never shuffle individually, only per-doc term
    * counts), a term-level rollup for the corpus frequencies, and the
    * top-`v` vocab re-enters as a BROADCAST side (v rows by construction —
    * this join is broadcastable no matter the corpus size, unlike the
    * general term join in [[topTerms]]). */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String, v: Int): DataFrame = {
    require(v > 0, "vocab size must be positive")
    val tf = termFreq(docs, idCol, textCol)
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    // orderBy+limit → TakeOrderedAndProject: each partition keeps v rows,
    // the driver merges v — no global sort, no single-partition window.
    val vocab = cf
      .orderBy(col("cf").desc, col("term").asc).limit(v)
      .select(col("term"), lit(1).as("__in_vocab"))
    tf.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, col("tf")).otherwise(lit(0L))).as("oov_tokens"))
      .withColumn("oov_e6",
        floor(col("oov_tokens") * lit(1.0) / col("n_tokens") * lit(1e6) + lit(0.5))
          .cast("long"))
  }

  /** N-gram novelty scores — the inverse signal of substring duplication:
    * per document, how many of its distinct word n-grams appear NOWHERE
    * else in the corpus. Low novelty marks templated/syndicated text even
    * when no single span crosses the dup threshold; high novelty is the
    * "unique content" side of a curation mix. Exact integers + one IEEE
    * division (micro-units), engine-portable.
    *
    * Scale shape: the (doc, gram) relation from [[Dedup.shingles]]
    * (distinct per doc, text never shuffles beyond the gram strings), gram
    * document-frequency via a count window over the gram partition — the
    * same one-scan discipline as [[topTerms]] — then one aggregation back
    * to the doc. Every document appears; gram-less docs (< n tokens)
    * report 0/0/0. */
  def gramNovelty(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val sh = Dedup.shingles(docs, idCol, textCol, n)
    val withDf = sh.withColumn("__df", count(lit(1)).over(Window.partitionBy("gram")))
    val agg = withDf.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("novel_grams"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"))
      .withColumn("novelty_e6",
        when(col("n_grams") === 0, 0L)
          .otherwise(floor(col("novel_grams").cast("double") / col("n_grams").cast("double")
            * 1e6 + 0.5).cast("long")))
  }

  /** Token-distribution Shannon entropy per document — the diversity
    * signal complementary to [[gramNovelty]] and the repetition fraction:
    * H = ln(n) − (Σ_t tf·ln(tf))/n over the document's token counts.
    * Near-zero entropy = a few tokens repeated (keyword-stuffing, menu
    * boilerplate, degenerate generations); high entropy = diverse
    * vocabulary. A Gopher-style curation mix thresholds both tails.
    *
    * Portability: each term's tf·ln(tf) is quantized to e6 integers before
    * the doc sum (ln of an exact integer — same operand both engines), and
    * the final H assembles from two quantized integers; no float ever
    * crosses an aggregation boundary.
    *
    * Scale shape: one (doc, term, tf) pre-aggregation (map-side
    * combinable) and one aggregation back to the doc — no joins, no
    * windows, no vocabulary relation. */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreq(Partitions.widen(docs, col(idCol)), idCol, textCol)
    tf.groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(floor(col("tf").cast("double") * log(col("tf").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long")).as("__s"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        (floor(log(col("n_tokens").cast("double")) * lit(1e6) + lit(0.5)).cast("long")
          - floor(col("__s").cast("double") / col("n_tokens").cast("double") + lit(0.5)).cast("long"))
          .as("entropy_e6"))
  }

  /** Blocklist screening — the term-level unsafe-content filter of a
    * curation pipeline: per document, how many token occurrences hit the
    * blocklist and the lexicographically-first hit (deterministic
    * evidence column); `blocked` = any hit. Matching is exact on
    * whitespace tokens — the word-boundary semantics regex blocklists get
    * wrong ("class" ≠ "ass").
    *
    * Scale shape: the blocklist joins as a BROADCAST relation against the
    * (doc, term, tf) pre-aggregation (real blocklists are 10²–10⁵ terms —
    * always the small side); docs with no hits rejoin via the id-only
    * left join, so text shuffles nowhere. */
  def blocklistHits(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val block = terms.toDF("term")
    val hits = termFreq(Partitions.widen(docs, col(idCol)), idCol, textCol)
      .join(broadcast(block), Seq("term"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_hits"), min(col("term")).as("first_hit"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("first_hit"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("blocked"))
  }

  /** Top-`k` terms per document by smoothed TF-IDF.
    * Output: idCol, term, score_e6 (ties broken by term ascending).
    *
    * Document frequency comes from a COUNT window over the term partition
    * of the tf relation — not a separate aggregate joined back. The join
    * formulation recomputes the whole tokenize+count subtree for its
    * second branch (Catalyst doesn't CSE across join inputs), i.e. it
    * scans and tokenizes the corpus TWICE; the window form scans once and
    * replaces the join shuffle with the same single shuffle on term. The
    * corpus size N is the only second read, and it prunes to the id
    * column. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val terms = termFreq(docs, idCol, textCol)
    val n = docs.agg(count_distinct(col(idCol)).as("n"))
    val scored = terms
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(n))
      .withColumn("score_e6",
        floor((col("tf") * (log((lit(1.0) + col("n")) / (lit(1.0) + col("df"))) + lit(1.0)))
          * lit(1e6) + lit(0.5)).cast("long"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_e6").desc, col("term").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(idCol), col("term"), col("score_e6"))
  }
}
