package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification, trained and applied
  * in-engine — the classifier-filter stage of a curation pipeline (the
  * role fastText's linear classifier plays in CCNet/LLaMA-style quality
  * and language filtering; McCallum & Nigam, "A Comparison of Event Models
  * for Naive Bayes Text Classification", AAAI-98 workshop). NB is the one
  * classic text classifier whose TRAINING is closed-form aggregation — two
  * hash aggs build the model, no gradient loop — so the whole
  * train-then-classify pipeline stays a single declarative plan.
  *
  * score(d, c) = ln P(c) + Σ_tokens tf·ln((n_{t,c} + 1) / (N_c + V))
  * (add-one smoothing). Every log term is quantized to integer micro-units
  * before the sums, so document scores are integer sums — argmax and
  * tie-breaks identical on every engine (discipline of [[LangModel]]).
  *
  * Scale shape: the model is two hash aggregations over the training
  * corpus — (term, class) counts (the big relation: kept distributed,
  * joined on its natural key, never collected) and per-class totals +
  * priors + vocabulary size (|classes| rows — broadcast). Scoring
  * pre-aggregates each document to (doc, term, tf), fans out by the
  * |classes|-row broadcast (bounded: distinct-terms × classes), left-joins
  * the count relation on (term, class), and aggregates back to (doc,
  * class) → one row_number argmax per doc. Hot terms skew the (term,
  * class) join; AQE skew-join splits them, as with every term join in
  * graft. */
object NaiveBayes {

  /** Train on `train` and score every (doc, class) pair of `docs`.
    * Output: (idCol, __lab, score_e6) — the full posterior surface behind
    * [[classify]] (argmax) and [[uncertainMargins]] (top-2 margin). */
  def classScores(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, labelCol: String): DataFrame = {
    val trTokens = train.select(col(labelCol).as("__lab"),
      explode(Text.tokens(col(textCol))).as("__term"))

    val classCounts = train.groupBy(col(labelCol).as("__lab")).agg(count(lit(1)).as("__nd"))
    val trainDocs = train.agg(count(lit(1)).as("__ndt"))
    val termClassCounts = trTokens.groupBy("__term", "__lab").agg(count(lit(1)).as("__n"))
    val tokensPerClass = trTokens.groupBy("__lab").agg(count(lit(1)).as("__nc"))
    val vocab = trTokens.agg(count_distinct(col("__term")).as("__v"))

    // |classes| rows: prior + smoothing denominator inputs, broadcast
    val classModel = classCounts
      .crossJoin(broadcast(trainDocs))
      .join(tokensPerClass, Seq("__lab"))
      .crossJoin(broadcast(vocab))
      .withColumn("__prior_e6",
        floor(log(col("__nd").cast("double") / col("__ndt").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long"))
      .select("__lab", "__prior_e6", "__nc", "__v")

    val docTerms = Partitions.widen(
        docs.select(col(idCol), explode(Text.tokens(col(textCol))).as("__term")), col(idCol))
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).as("__tf"))

    val scored = docTerms
      .crossJoin(broadcast(classModel))
      .join(termClassCounts, Seq("__term", "__lab"), "left")
      .withColumn("__lp_e6",
        floor(log((coalesce(col("__n"), lit(0L)) + lit(1.0)) /
            (col("__nc").cast("double") + col("__v").cast("double")))
          * lit(1e6) + lit(0.5)).cast("long"))

    scored.groupBy(col(idCol), col("__lab"))
      .agg((min(col("__prior_e6")) + sum(col("__tf") * col("__lp_e6"))).as("score_e6"))
  }

  /** Train on `train` (labels in `labelCol`), classify every row of `docs`.
    * Output: (idCol, pred_label, score_e6) — the argmax class and its
    * quantized joint log-likelihood (ties broken by label ascending). */
  def classify(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, labelCol: String): DataFrame = {
    val perClass = classScores(train, docs, idCol, textCol, labelCol)
    val w = Window.partitionBy(col(idCol)).orderBy(col("score_e6").desc, col("__lab").asc)
    perClass
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__lab").as("pred_label"), col("score_e6"))
  }

  /** Uncertainty sampling (smallest-margin active learning, Lewis & Gale
    * '94 / Settles' survey): the `k` docs whose top-2 class scores are
    * closest — exactly the rows a labeling budget should go to, and the
    * standard "route to a stronger model" trigger in a model-filtered
    * curation pipeline. Margin = score₁ − score₂ on the quantized integer
    * scores, so the global bottom-k cutoff is engine-exact.
    *
    * Output: (idCol, pred_label, margin_e6, unc_rank), rank 1..k by
    * (margin ASC, id ASC).
    *
    * Scale shape: the per-(doc, class) surface reduces to two rows per doc
    * (per-doc window, WindowGroupLimit) before the GLOBAL bottom-k, which
    * is orderBy+limit → TakeOrderedAndProject — each partition keeps k
    * rows, the driver merges k, never a single-partition sort of the
    * corpus. The final dense rank is a window over k rows only. */
  def uncertainMargins(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, labelCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val margins = top2Margins(train, docs, idCol, textCol, labelCol)
      .select(col(idCol), col("pred_label"),
        (col("__s1") - col("__s2")).as("margin_e6"))
    val bottomK = margins.orderBy(col("margin_e6").asc, col(idCol).asc).limit(k)
    val wr = Window.orderBy(col("margin_e6").asc, col(idCol).asc)
    bottomK.withColumn("unc_rank", row_number().over(wr).cast("int"))
  }

  /** (idCol, pred_label, __s1, __s2): top-1 class + score and top-2 score
    * per doc, in ONE pass over the posterior surface. The rank-≤2 window
    * rows pivot through a per-doc aggregate instead of the historical
    * top1 ⋈ top2 SELF-join, which executed the whole train-and-score
    * subtree once per side (the dual-reference shape r16 also removed
    * from ivfTopK) and paid a join where a same-key aggregate suffices —
    * the aggregate rides the window's existing hash partitioning on
    * idCol, adding no exchange. Docs with a single scored class are
    * dropped (`__s2` null), preserving the self-join's inner semantics. */
  private def top2Margins(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, labelCol: String): DataFrame = {
    val perClass = classScores(train, docs, idCol, textCol, labelCol)
    val w = Window.partitionBy(col(idCol)).orderBy(col("score_e6").desc, col("__lab").asc)
    perClass.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col(idCol))
      .agg(
        max(when(col("__rn") === 1, struct(col("score_e6"), col("__lab")))).as("__t1"),
        max(when(col("__rn") === 2, col("score_e6"))).as("__s2"))
      .filter(col("__s2").isNotNull)
      .select(col(idCol), col("__t1.__lab").as("pred_label"),
        col("__t1.score_e6").as("__s1"), col("__s2"))
  }

  /** Label-noise audit (the confident-learning signal, Northcutt et al.
    * 2021, in its simplest margin form): docs where the model CONFIDENTLY
    * disagrees with the given label — prediction ≠ label and the top-2
    * margin is large. The complement of [[uncertainMargins]]: uncertain
    * rows get a labeling budget, confidently-contradicted rows get a
    * label AUDIT (they are the likely annotation errors that poison both
    * training and eval).
    *
    * Output: (idCol, labelCol, pred_label, margin_e6, noise_rank), rank
    * 1..k by (margin DESC, id ASC). Same plan shape as uncertainMargins —
    * per-doc WindowGroupLimit then a global TakeOrderedAndProject. */
  def confidentErrors(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, labelCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val labeled = docs.select(col(idCol).as("__idl"), col(labelCol))
    val margins = top2Margins(train, docs, idCol, textCol, labelCol)
      .join(labeled, col(idCol) === col("__idl"))
      .where(col("pred_label") =!= col(labelCol))
      .select(col(idCol), col(labelCol), col("pred_label"),
        (col("__s1") - col("__s2")).as("margin_e6"))
    val topK = margins.orderBy(col("margin_e6").desc, col(idCol).asc).limit(k)
    val wr = Window.orderBy(col("margin_e6").desc, col(idCol).asc)
    topK.withColumn("noise_rank", row_number().over(wr).cast("int"))
  }

  /** Calibration curve (reliability diagram in rank-bucket form): docs
    * sorted by top-2 margin, cut into `buckets` equal-count bins (ntile),
    * accuracy per bin. A usable filter shows accuracy RISING with margin —
    * if the top bin isn't near-perfect, margin is not a confidence signal
    * and the [[confidentErrors]] audit can't be trusted either. Completes
    * the model-eval family (confusion → uncertainty → noise → calibration).
    *
    * Output: (cal_bucket 1..buckets by ascending margin, n_docs,
    * n_correct, acc_e6). Integer counts + one IEEE division per bin; the
    * ntile cut is deterministic because the order (margin, id) is total.
    *
    * Scale shape: same per-doc reduction as [[uncertainMargins]]; the
    * ntile is the one global-sort term (rows = |docs| already reduced to
    * one row each). At 100 TB, bucket by margin VALUE ranges instead to
    * drop the global sort; rank buckets are the statistically clean form
    * while the margin distribution is unknown. */
  def calibrationCurve(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, labelCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least two calibration buckets")
    val labeled = docs.select(col(idCol).as("__idl"), col(labelCol))
    val margins = top2Margins(train, docs, idCol, textCol, labelCol)
      .join(labeled, col(idCol) === col("__idl"))
      .select(col(idCol),
        (col("__s1") - col("__s2")).as("__margin_e6"),
        when(col("pred_label") === col(labelCol), 1L).otherwise(0L).as("__correct"))
    val wb = Window.orderBy(col("__margin_e6").asc, col(idCol).asc)
    margins
      .withColumn("cal_bucket", ntile(buckets).over(wb).cast("int"))
      .groupBy(col("cal_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__correct")).as("n_correct"))
      .withColumn("acc_e6",
        floor(col("n_correct") * lit(1.0) / col("n_docs") * lit(1e6) + lit(0.5))
          .cast("long"))
  }
}
