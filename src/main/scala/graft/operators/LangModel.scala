package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model scoring for corpus curation — the
  * perplexity-filter stage of a web-scale training-data pipeline (CCNet:
  * Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets from
  * Web Crawl Data", LREC 2020, which ranks Common Crawl documents by the
  * perplexity of a KenLM model trained on a clean reference corpus).
  *
  * This is the n-gram-count core of that idea, in-engine: train an
  * add-one-smoothed bigram model on a reference corpus (any DataFrame — a
  * curated subset, a prior snapshot, a different source), then score every
  * document by its total and per-token negative log-likelihood. High
  * `avg_nll_e6` = far from the reference distribution = gibberish / OCR
  * noise / wrong-language candidates; the score is the ranking key a
  * curation pipeline thresholds or quota-samples on.
  *
  * Engine portability: each bigram's `-ln((c_bigram + 1) / (c_left + V))`
  * is quantized to integer micro-units BEFORE the per-document sum, so the
  * document score is a sum of integers — order-independent and identical
  * across engines regardless of float-summation order (`ln` ulp differences
  * are absorbed by the quantization, the discipline proven by
  * [[TermStats.topTerms]]).
  *
  * Scale shape: the model IS two hash aggregations over the reference
  * corpus ((left,right) counts and left-history counts) — no driver-side
  * state, no collected vocabulary; the vocabulary size V rides along as a
  * broadcast single-row frame. Scoring pre-aggregates each document to
  * (doc, left, right, tf) so the model join fans out per DISTINCT bigram,
  * not per occurrence, then joins the count relations on their natural
  * keys (both shuffle equi-joins; the model side is NOT assumed
  * broadcastable — at 100 TB a bigram table isn't). Hot bigrams ("of the")
  * skew the join key; AQE skew-join handles that split, same as the term
  * join in [[TermStats]].
  */
object LangModel {

  /** (idCol, left, right) adjacent-token pairs, repeats kept — one row per
    * bigram OCCURRENCE. Per-row lambda over the token array; no join. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), Text.tokens(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(col(idCol), explode(transform(sequence(lit(0), size(col("__ws")) - 2),
        i => struct(
          element_at(col("__ws"), i + 1).as("left"),
          element_at(col("__ws"), i + 2).as("right")))).as("__p"))
      .select(col(idCol), col("__p.left").as("left"), col("__p.right").as("right"))

  /** The trained model relations: ((left,right)→count, left→count,
    * 1-row vocabulary size) — two hash aggs + a scalar, shared by the
    * batch and streaming scoring paths. */
  private def model(train: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val trainBigrams = bigrams(train, idCol, textCol).select("left", "right")
    val bigramCounts = trainBigrams.groupBy("left", "right").agg(count(lit(1)).as("__cb"))
    val historyCounts = trainBigrams.groupBy("left").agg(count(lit(1)).as("__cl"))
    val vocab = train.select(explode(Text.tokens(col(textCol))).as("__term"))
      .agg(count_distinct(col("__term")).as("__v"))
    (bigramCounts, historyCounts, vocab)
  }

  private def nllE6(cb: org.apache.spark.sql.Column, cl: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(v > 0,
      floor(-log((coalesce(cb, lit(0L)) + lit(1.0)) /
          (coalesce(cl, lit(0L)).cast("double") + v.cast("double")))
        * lit(1e6) + lit(0.5)).cast("long"))

  /** Score every row of `docs` under an add-one-smoothed bigram model
    * trained on `train`.
    *
    * Output: (idCol, n_bigrams, nll_e6, avg_nll_e6) — total bigram count,
    * total negative log-likelihood in micro-units, and its per-bigram mean.
    * Documents with fewer than 2 tokens score (0, 0, 0): no evidence, no
    * penalty — callers filter on `n_bigrams` if they want them gone. */
  def bigramNll(train: DataFrame, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (bigramCounts, historyCounts, vocab) = model(train, idCol, textCol)

    val docBigrams = Partitions.widen(bigrams(docs, idCol, textCol), col(idCol))
      .groupBy(col(idCol), col("left"), col("right")).agg(count(lit(1)).as("__tf"))

    // -ln of the smoothed conditional, quantized per DISTINCT bigram, then
    // weighted by tf — the sum over quantized integers is order-independent.
    // V = 0 (empty/token-less reference corpus) would make the smoothing
    // denominator 0 for unseen histories — an ANSI DIVIDE_BY_ZERO task
    // failure at runtime; the guard NULLs the per-bigram term, which the
    // final coalesce turns into all-zero scores (no evidence, no penalty),
    // pinned by LangModelSpec.
    val scored = docBigrams
      .join(bigramCounts, Seq("left", "right"), "left")
      .join(historyCounts, Seq("left"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__nll_e6", nllE6(col("__cb"), col("__cl"), col("__v")))

    val agg = scored.groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_bigrams"),
        sum(col("__tf") * col("__nll_e6")).as("nll_e6"))

    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_e6"), lit(0L)).as("nll_e6"))
      .withColumn("avg_nll_e6",
        when(col("n_bigrams") === 0, 0L)
          .otherwise(floor(col("nll_e6").cast("double") / col("n_bigrams").cast("double")
            + lit(0.5)).cast("long")))
  }

  /** Streaming form: score a LIVE document stream against a model trained
    * on a STATIC reference corpus — the "filter the incoming crawl with
    * last snapshot's model" deployment shape. The model relations join
    * stream-static (Spark keeps the static side as a plain batch lookup);
    * scoring is restructured to ONE streaming aggregation (per-occurrence
    * join, no (doc,bigram,tf) pre-agg — streams allow a single agg), so it
    * runs in update/complete mode. The vocabulary scalar joins on a
    * constant key — stream-static equi-join, where a crossJoin would be an
    * unsupported streaming cartesian.
    *
    * Output: (idCol, n_bigrams, nll_e6) per document seen so far —
    * documents with < 2 tokens never enter the state (no bigrams), unlike
    * the batch form's explicit zero rows. `avg` is left to the consumer:
    * deriving it inside would need a second projection over an
    * aggregation output, which complete-mode sinks handle but update-mode
    * row stores typically recompute anyway. */
  def bigramNllStream(train: DataFrame, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (bigramCounts, historyCounts, vocab) = model(train, idCol, textCol)
    val occurrences = bigrams(docs, idCol, textCol)
      .withColumn("__one", lit(1))
    occurrences
      .join(bigramCounts, Seq("left", "right"), "left")
      .join(historyCounts, Seq("left"), "left")
      .join(vocab.withColumn("__one", lit(1)), Seq("__one"))
      .withColumn("__nll_e6", nllE6(col("__cb"), col("__cl"), col("__v")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__nll_e6")).as("nll_e6"))
  }
}
