package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** BM25 full-text retrieval over a document corpus — the lexical ranking
  * stage of a RAG / search pipeline (Robertson & Spärck Jones probabilistic
  * relevance framework; the BM25 form follows Robertson et al., TREC-3
  * '94, with the non-negative "BM25+"-style idf `ln(1 + (N-df+0.5)/(df+0.5))`
  * used by Lucene).
  *
  * Reference relevance: the reference pipeline has no retrieval stage —
  * this is part of the beyond-parity training-data/RAG surface (pairs with
  * [[TermStats.topTerms]]'s TF-IDF weighting and the ANN stack in
  * [[Similarity]]: BM25 is the sparse leg of hybrid retrieval).
  *
  * Scale shape (the part that matters at 100 TB):
  *   - The corpus is never compared pairwise. Candidates come from an
  *     INVERTED-INDEX EQUI-JOIN: query terms ⋈ (term, doc) postings, so
  *     cost is Σ_term |q terms matching| × df(term) — linear in postings
  *     touched, the same shape a Lucene shard evaluates.
  *   - `maxDfFrac` drops terms with document frequency above a fraction of
  *     the corpus BEFORE the join — stopword postings are the classic
  *     skew/volume killer (a term in 80% of 100 TB is a useless candidate
  *     generator that dominates the shuffle). This is the analogue of
  *     [[Dedup]]'s hot-shingle cap.
  *   - Corpus constants (N, Σdl) enter as a 1-row aggregate broadcast
  *     (cross join with a single row), never a driver-side collect.
  *
  * Determinism / oracle story: idf is the ONLY transcendental and is
  * quantized to integer micro-units per DISTINCT TERM (≤ |vocab| ln()
  * sites). The per-(query,doc,term) contribution is then
  * `floor(idf_e6 · tfNorm + 0.5)` where tfNorm is built from integer
  * tf/dl/N/Σdl with one IEEE multiply/divide chain — bit-identical on any
  * IEEE-754 engine, so ranking ties cannot flip cross-engine. Final score
  * is an exact integer sum of those contributions.
  */
object Retrieval {

  /** Token-frequency relation (id, term, tf) plus doc length (id, dl).
    *
    * `dl` is derived FROM `tf` (not from a second explode): every
    * downstream relation — df, corpus stats, postings — then shares the
    * single (id, term) aggregation subtree, and Spark's ReuseExchange
    * computes the token explode + shuffle ONCE per query instead of once
    * per derived relation (measured 4 Generate subtrees → 1). */
  private def termFrequencies(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val toks = docs
      .select(col(idCol), Text.tokens(col(textCol)).as("__ws"))
      .select(col(idCol), size(col("__ws")).as("dl"), explode(col("__ws")).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dl = tf.groupBy(col(idCol)).agg(first(col("dl")).as("dl"))
    (tf, dl)
  }

  /** Top-`k` BM25 matches for each query document.
    *
    * `queries` is a (queryId, text) DataFrame; its DISTINCT terms form the
    * query (query-side tf is ignored — the standard simplification for
    * short queries, documented here because our synthetic queries are full
    * docs). Self-matches (queryId == docId when ids collide) are excluded.
    *
    * Output: (queryId, docId, score_e6, rank) — rank 1..k per query,
    * ordered by (score_e6 DESC, docId ASC) so ties break deterministically.
    *
    * @param maxDfFrac drop query/posting terms whose df > maxDfFrac × N
    *                  (stopword pruning; 1.0 disables)
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame,
               idCol: String, textCol: String,
               qidCol: String, qtextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75,
               maxDfFrac: Double = 1.0): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0, "maxDfFrac must be in (0,1]")

    val (tf, dl) = termFrequencies(docs, idCol, textCol)

    // Corpus constants as a 1-row broadcastable aggregate — exact integers.
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))

    // df + idf per distinct term; the ln() site is quantized HERE (one per
    // term) so no transcendental reaches the per-pair path.
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(broadcast(stats))
      .where(col("df") <= col("n") * lit(maxDfFrac))
      .select(col("term"),
        floor(log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * lit(1e6) + lit(0.5)).cast("long").as("idf_e6"))

    val qterms = queries
      .select(col(qidCol).as("query_id"), explode_outer(array_distinct(Text.tokens(col(qtextCol)))).as("term"))
      .where(col("term").isNotNull)

    // Inverted-index candidate generation: query terms ⋈ postings on term.
    val postings = tf.crossJoin(broadcast(stats))
      .join(idf, "term") // df-pruned terms drop out of the postings here
      .select(col("term"), col(idCol).as("doc_id_m"), col("tf"), col("dl"),
        col("n"), col("sum_dl"), col("idf_e6"))

    val contrib = qterms.join(postings, "term")
      .where(col("query_id") =!= col("doc_id_m"))
      .select(col("query_id"), col("doc_id_m"),
        // tfNorm = tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/Σdl)) — pure IEEE
        // arithmetic over exact integers, identical expression shape in the
        // oracle SQL; contribution floors to an exact integer.
        floor(col("idf_e6") *
          (col("tf") * lit(k1 + 1.0) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") * col("n") / col("sum_dl"))))
          + lit(0.5)).cast("long").as("c_e6"))

    val scored = contrib.groupBy(col("query_id"), col("doc_id_m"))
      .agg(sum(col("c_e6")).as("score_e6"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_e6").desc, col("doc_id_m").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id_m").as("doc_id"), col("score_e6"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
    * the standard way to combine a sparse (BM25) and a dense (embedding
    * ANN) retrieval leg into one hybrid ranking without score calibration:
    * each leg contributes `1/(c + rank)` per (query, doc), summed across
    * legs; `c = 60` is the paper's constant, damping the head so one leg's
    * rank-1 can't drown the other leg's consensus.
    *
    * Every input must carry (query_id, doc_id, rank). Contributions are
    * the exact integers `1000000 div (c + rank)` — integer division
    * truncates identically on any engine (both operands positive), so the
    * fused score has NO floating point at all.
    *
    * Scale shape: the legs have already reduced the corpus to queries×k
    * rows each; fusion is a union + one hash aggregation + a per-query
    * window — negligible next to either leg. At 100 TB the legs are the
    * scale problem (see [[bm25TopK]] / [[Similarity.lshTopK]]); fusion
    * composes whatever tier of each the deployment picked.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k > 0 && c >= 0, "k must be positive, c non-negative")
    val contribs = rankings.map(_.select(
      col("query_id"), col("doc_id"),
      expr(s"CAST(1000000 div ($c + rank) AS BIGINT)").as("__c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("rrf_e6"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_e6").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
  }
}
