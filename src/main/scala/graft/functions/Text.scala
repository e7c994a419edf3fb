package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines:
  * tokenization, shingling, quality scoring, language ID, fingerprints.
  *
  * Everything here is built from Catalyst built-ins / higher-order
  * functions, so it stays inside whole-stage codegen — no Scala/Python UDF
  * boundary on the 100 TB hot path.
  */
object Text {

  /** Whitespace tokens. Single-space splitting matches the synthetic corpus;
    * [[tokensRegex]] is the robust variant for real text. */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex tokenization (BPE-ish pre-tokenizer shape: letter runs, digit
    * runs, or single non-space symbols). */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokensRegex(text: Column): Column = regexp_extract_all(text, lit(BpeishPattern), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct word n-gram shingles — the unit of Jaccard/MinHash dedup.
    * Implemented as slice+transform over the token array (no explode here;
    * callers explode only when they need the (doc, gram) relation).
    *
    * NOTE for hot paths: this inlines the tokenizer into every reference,
    * so feed it short texts or pre-tokenize — [[graft.operators.Dedup
    * .shingles]] materializes the token array once and uses
    * [[nGramsFromTokens]]. */
  def wordNGrams(text: Column, n: Int): Column = nGramsFromTokens(tokens(text), n)

  /** N-grams over an ALREADY-tokenized array column — `ws` should be a
    * plain attribute (computed once per row), not an expression, or the
    * per-position lambda re-evaluates it O(tokens) times. */
  def nGramsFromTokens(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      array_distinct(
        transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Duplicate-n-gram fraction in [0,1] over an ALREADY-tokenized array:
    * `(total n-grams − distinct n-grams) / total` — the Gopher-family
    * repetition signal (high values mark boilerplate/spam docs a training
    * pipeline should drop). 0 for docs shorter than n tokens. Built from
    * exact integer counts and one IEEE double division, so the value is
    * bit-identical on any engine (no transcendentals). */
  def repetitionFromTokens(ws: Column, n: Int): Column = {
    val total = (size(ws) - n + 1).cast("double")
    val dist = size(nGramsFromTokens(ws, n)).cast("double")
    when(total > 0, (total - dist) / total).otherwise(lit(0.0))
  }

  /** Heuristic document-quality score in [0,1]: blends token count (longer
    * is better up to a cap), mean token length sanity, alpha ratio, and
    * stopword presence — the shape of a C4/Gopher-style quality filter,
    * kept deterministic and codegen-only. */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** Unrounded score — use when the caller controls quantization (the
    * oracle boundary quantizes to integer micro-units instead of round(),
    * which differs between engines at exact .5 boundaries). Empty text
    * scores 0 — the alpha-ratio term would otherwise divide by zero,
    * which Spark's ANSI mode turns into a task failure (same hazard class
    * as zero-norm embeddings in the cosine stack). */
  def qualityScoreRaw(text: Column): Column = {
    val ws = tokens(text)
    val nTok = size(ws).cast("double")
    val alphaChars = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val nChars = length(text).cast("double")
    val meanTokLen = (nChars - (nTok - 1)) / nTok
    val lengthScore = least(nTok / lit(100.0), lit(1.0))
    val alphaRatio = alphaChars / nChars
    val tokLenScore =
      when(meanTokLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.3))
    val stopwordScore =
      when(size(array_intersect(ws, StopwordsEn)) > 0, lit(1.0)).otherwise(lit(0.5))
    when(nChars > 0,
      lengthScore * lit(0.3) + alphaRatio * lit(0.3) +
        tokLenScore * lit(0.2) + stopwordScore * lit(0.2))
      .otherwise(lit(0.0))
  }

  private val StopwordsEn: Column =
    array(Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that").map(lit): _*)

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Public common function words only. */
  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for", "with", "this"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour", "dans", "des"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "un", "una", "es", "que", "por", "para"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "von", "zu", "mit", "den", "nicht"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "他", "这", "人", "们", "中"))

  /** Language-ID heuristic: argmax over per-language stopword hit counts on
    * the token set; `und` when no profile matches. Deterministic tie-break:
    * higher score wins, then lexicographically-smaller language code. */
  def langId(text: Column): Column = {
    val ws = array_distinct(tokens(text))
    val scored = LangProfiles.map { case (code, words) =>
      struct(
        size(array_intersect(ws, array(words.map(lit): _*))).as("score"),
        lit(code).as("code"))
    }
    // array_max on (score, code) structs picks highest score; among equal
    // scores it picks the LARGEST code, so invert via array_sort+reverse…
    // simpler: sort by (-score, code) encoded as (score desc via negation).
    val best = array_min(array(scored.map(s =>
      struct((-s.getField("score")).as("negScore"), s.getField("code").as("code"))): _*))
    when(best.getField("negScore") < 0, best.getField("code")).otherwise(lit("und"))
  }

  /** 64-bit polynomial rolling hash of the whole string (base 31 over UTF-8
    * bytes, wrapping Long arithmetic) — a content fingerprint that is cheap,
    * order-sensitive, and stable across engines/runs. Codegen'd via the
    * custom Catalyst expression [[graft.functions.expressions.RollingHash]].
    */
  def fingerprint(text: Column): Column =
    graft.functions.expressions.RollingHash.fingerprint(text)

  /** Cryptographic-strength content key for exact dedup at scale (md5 of
    * text); identical across Spark and DuckDB, usable as a shuffle key. */
  def contentKey(text: Column): Column = md5(text)

  /** PII scrub: replace email addresses and long digit/phone runs with
    * placeholder tokens. Patterns avoid backreferences/lookaround so the
    * same regex runs identically under Java regex (Spark) and RE2
    * (DuckDB) — keep it that way if extending. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
}
