package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplicate detection: find runs of `k` consecutive tokens
  * whose content appears in MORE THAN ONE document, and merge the hits into
  * maximal per-document spans. This is the span-level complement of
  * document-level dedup ([[Dedup]]): two documents can be globally distinct
  * yet share a paragraph (quoted boilerplate, syndicated text, license
  * blocks) that a training pipeline wants to locate — and optionally cut —
  * rather than dropping either document whole. Technique shape follows Lee
  * et al., "Deduplicating Training Data Makes Language Models Better"
  * (ACL 2022), re-expressed relationally: their suffix-array substring scan
  * becomes a token-window fingerprint equi-join, which is the form that
  * shards over a cluster.
  *
  * Scale notes:
  *  - the window relation carries (id, pos, 16-byte md5) — window TEXT
  *    never shuffles, same discipline as [[Dedup.exactGroups]];
  *  - duplicate detection is one hash aggregation on the window key with a
  *    map-side-combinable `count(distinct id) > 1` test, then a semi-join
  *    back — both key-partitioned shuffles, no pairwise comparison anywhere
  *    (a window shared by 10k documents costs its row count, not 10k²);
  *  - span merging is a per-document gaps-and-islands window pass — one
  *    shuffle on the document id, state bounded by dup windows per doc.
  */
object SubstringDedup {

  /** The (id, pos, whash) token-window fingerprint relation: one row per
    * `k`-token window at 0-based token offset pos. Tokenizes ONCE into an
    * attribute (see [[Dedup.shingles]] for why), widens the scan so a
    * single-row-group parquet file fans out, and generates windows with
    * the native [[graft.functions.expressions.WindowGrams]] GENERATOR —
    * which streams one window at a time instead of materializing the full
    * per-document window array the `explode(transform(...))` HOF form
    * builds (O(tokens·k) transient bytes per row — real memory on
    * book-length documents). */
  def windowFingerprints(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"window size k must be >= 2, got $k")
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__ws"))
    Partitions.widen(toks, col(idCol))
      .select(col(idCol),
        graft.functions.expressions.WindowGrams.windows(col("__ws"), k).as(Seq("pos", "gram")))
      .select(col(idCol), col("pos"), md5(col("gram")).as("whash"))
  }

  /** Window positions whose content occurs in more than one document.
    * Output: (id, pos), distinct by construction. */
  def crossDocDupWindows(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = windowFingerprints(df, idCol, textCol, k)
    val dup = w.groupBy("whash")
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > 1)
      .select("whash")
    w.join(dup, Seq("whash"), "left_semi").select(col(idCol), col("pos"))
  }

  /** Gaps-and-islands merge of a (id, pos) window relation into maximal
    * spans: overlapping or adjacent `k`-windows coalesce. Output: (id,
    * span_start, span_end, span_tokens, n_windows), token offsets 0-based
    * inclusive.
    *
    * Islands form with the classic running-max trick: a window starts a new
    * span iff its offset clears the furthest end seen so far by more than
    * one token (strictly-after-adjacent ⇒ a gap of uncovered tokens). */
  private def mergeWindows(dup: DataFrame, idCol: String, k: Int): DataFrame = {
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevEnd = max(col("pos"))
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1)) + lit(k - 1)
    val flagged = dup
      .withColumn("__new",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(byPos))
    flagged.groupBy(col(idCol), col("__island"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_windows"))
  }

  /** Maximal cross-document duplicated token spans per document. */
  def dupSpans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    mergeWindows(crossDocDupWindows(df, idCol, textCol, k), idCol, k)

  /** Window occurrences that are NOT the canonical (first) copy of their
    * content: for each distinct window text, the occurrence with the
    * smallest (id, pos) is kept; every other occurrence — in other docs OR
    * repeated within the same doc — is emitted as a cut candidate. This is
    * Lee et al.'s keep-one-copy policy at window granularity. One ranking
    * window keyed on the 16-byte hash — the same single-shuffle shape as
    * the dup test. */
  def keepOneDupWindows(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = windowFingerprints(df, idCol, textCol, k)
    val byHash = Window.partitionBy(col("whash"))
      .orderBy(col(idCol).asc, col("pos").asc)
    w.withColumn("__rn", row_number().over(byHash))
      .filter(col("__rn") > 1)
      .select(col(idCol), col("pos"))
  }

  /** Cut duplicated substrings out of the corpus, keeping exactly one copy
    * of every duplicated `k`-token window (the occurrence with the
    * smallest (id, pos)): non-canonical occurrences merge into maximal
    * spans, and each document's text is rebuilt without the tokens those
    * spans cover. Documents with nothing to cut pass through verbatim.
    * Output: (id, clean_text, n_cut_tokens).
    *
    * The rebuild joins each doc's span LIST (collect_list per doc — size
    * bounded by dup spans per doc, not corpus) back on the id and filters
    * the token array with an index-aware HOF — no explode of the token
    * relation, no non-equi join. Text crosses the wire exactly once (the
    * spans side carries only integers). */
  def cutDupSpans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val spans = mergeWindows(keepOneDupWindows(df, idCol, textCol, k), idCol, k)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("__spans"))
    val toks = df.select(col(idCol), col(textCol), Text.tokens(col(textCol)).as("__ws"))
    toks.join(spans, Seq(idCol), "left")
      .select(
        col(idCol),
        when(col("__spans").isNull, col(textCol))
          .otherwise(concat_ws(" ",
            filter(col("__ws"), (tok, i) =>
              !exists(col("__spans"),
                s => i.cast("long").between(s.getField("s"), s.getField("e"))))))
          .as("clean_text"),
        coalesce(
          aggregate(col("__spans"), lit(0L),
            (acc, s) => acc + s.getField("e") - s.getField("s") + 1L),
          lit(0L)).as("n_cut_tokens"))
  }

  /** Per-document duplication profile: total tokens, tokens covered by
    * cross-document duplicated spans, and the duplicated fraction in
    * integer micro-units (exact IEEE division of two integers — engine
    * portable, same quantization as the quality/repetition scores).
    * Every input document appears (zero-duplication docs report 0). */
  def dupStats(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val perDoc = dupSpans(df, idCol, textCol, k)
      .groupBy(col(idCol))
      .agg(sum(col("span_tokens")).as("__dup"))
    df.select(col(idCol), size(Text.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__dup"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_frac_e6",
        floor(col("dup_tokens").cast("double") / col("n_tokens").cast("double")
          * 1e6 + 0.5).cast("long"))
  }
}
