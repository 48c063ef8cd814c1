package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, language ID, quality scoring, document fingerprinting. All are
 * built from codegen'd built-in expressions (`org.apache.spark.sql.functions`)
 * — no per-row UDFs — so they stay inside whole-stage codegen and scale
 * linearly with input splits (no shuffle at all for the per-document ops).
 *
 * The reference engine (delta-rs) has no text operators; these follow the
 * common corpus-curation recipes (C4/Gopher-style heuristics) re-expressed
 * as Spark column expressions.
 */
object TextOps {

  /** Lowercase, strip non-alphanumerics, collapse runs of spaces.
    * Deterministic normalization used by [[fingerprint]] and dedup. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Stable document fingerprint: md5 of the normalized text. Two documents
    * with the same fingerprint are duplicates modulo case/punct/whitespace. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Whitespace tokenizer: trims, then splits on whitespace RUNS (space,
    * tab, newline). A single-space split miscounts real documents — "a  b"
    * yields an empty token and "a\nb" never splits — skewing every stat
    * built on it. Empty/blank text yields an EMPTY array, not [""]. */
  def words(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** Exact whitespace token count. */
  def wordCount(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish token estimate: word-piece count where each word contributes
    * ceil(len/4) pieces plus standalone punctuation; a cheap deterministic
    * stand-in for a real tokenizer, computed per-row without UDFs. */
  def tokenEstimate(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, s) => acc + ((length(s) + lit(3)) / lit(4)).cast("long"))

  /** Quality heuristics: mean word length, alpha ratio, digit ratio.
    * Returned as separate columns by [[qualityColumns]]. */
  def meanWordLen(text: Column): Column = {
    val w = words(text)
    // blank text has zero words: 0/0 would be NaN, which defeats threshold
    // filters (NaN compares greater than every number)
    when(size(w) === 0, lit(0.0)).otherwise(
      aggregate(transform(w, s => length(s).cast("double")), lit(0.0), (a, x) => a + x) /
        size(w).cast("double"))
  }

  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
        length(text).cast("double"))

  /** Marker-word language scoring: counts occurrences of per-language
    * stopwords and picks the argmax (ties → 'und'). Pure column expressions;
    * the marker lists are tiny and inlined into codegen. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "que"))

  /** Number of elements of `w` (a string array) equal to one of `markers`. */
  private def markerHits(w: Column, markers: Seq[String]): Column =
    size(filter(w, s => markers.map(m => s === lit(m)).reduce(_ || _)))

  def langScores(text: Column): Seq[(String, Column)] = {
    val w = words(normalize(text))
    langMarkers.map { case (lang, ms) => lang -> markerHits(w, ms) }
  }

  /** Predicted language: argmax marker count, first-listed wins ties,
    * 'und' when no marker hit. */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Per-document text statistics. The token array is materialized ONCE in
    * a lower projection and both word stats derive from that alias — inlining
    * `words(t)` into each stat would run the whitespace-run split per
    * expression (CollapseProject keeps multi-referenced non-cheap aliases,
    * so the two projections stay split in the optimized plan). */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol), length(t).cast("long").as("n_chars"), words(t).as("__w"))
      .select(
        col(idCol),
        col("n_chars"),
        size(col("__w")).cast("long").as("n_words"),
        // ceil(len/4) == (len+3) div 4 for non-negative lengths: one
        // aggregate lambda in integer math, no intermediate per-word array
        aggregate(col("__w"), lit(0L),
          (acc, s) => acc + ((length(s) + lit(3)) / lit(4)).cast("long")).as("n_tokens"))
  }
}
