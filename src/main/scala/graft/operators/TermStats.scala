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
