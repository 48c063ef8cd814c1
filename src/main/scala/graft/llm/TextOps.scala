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

  /** Lowercase, strip non-alphanumerics, collapse whitespace runs to one
    * space. Unicode letters/digits of EVERY script survive — the old
    * ASCII-only `[^a-z0-9\s]` class normalized every fully non-Latin
    * document (all of Chinese, Russian, ...) to the EMPTY STRING, giving
    * them one shared fingerprint: exact dedup then kept one document out
    * of an entire language's corpus (silent mass data loss on multilingual
    * data). Newlines/tabs are WHITESPACE, not punctuation: deleting them
    * (an even older class) glued words across line breaks, so two
    * documents identical modulo line-wrapping — ubiquitous in web text —
    * got different fingerprints. Whitespace is the full UNICODE set,
    * not Java's ASCII-only `\s`: `[\s\p{Z}\x85]` adds the separator
    * categories (NBSP U+00A0, thin/ideographic spaces, line/paragraph
    * separators) plus NEL U+0085 - web text routinely carries literal
    * NBSP, and classifying it as punctuation DELETED it, gluing the
    * NBSP form of 'foo bar' into 'foobar' while the plain-space form
    * stayed two words: different fingerprints for space-type-identical
    * documents, the newline bug one tier up. The DuckDB oracle mirror
    * (`LlmEntries.normSql`, RE2 `[\s\p{Z}\x{0085}]`) is pinned
    * empirically to agree. Deterministic normalization used by
    * [[fingerprint]] and dedup. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text),
      "[^\\p{L}\\p{N}\\s\\p{Z}\\x85]", ""), "[\\s\\p{Z}\\x85]+", " "))

  /** Stable document fingerprint: md5 of the normalized text. Two documents
    * with the same fingerprint are duplicates modulo case/punct/whitespace. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Whitespace tokenizer: trims, then splits on whitespace RUNS (space,
    * tab, newline). A single-space split miscounts real documents — "a  b"
    * yields an empty token and "a\nb" never splits — skewing every stat
    * built on it. Empty/blank text yields an EMPTY array, not [""].
    *
    * DELIBERATELY ASCII `\s`, unlike [[normalize]]'s Unicode class: NBSP
    * exists precisely to mark a non-breaking point, so a TOKENIZER keeping
    * "U.S. Navy" as one token is semantically right even though the
    * dedup FINGERPRINT treats the same byte as whitespace. Split on
    * [[WsRun]], NOT Java `\s`: Java's `\s` also matches VT (U+000B)
    * while DuckDB/RE2's does not, so VT-bearing text would tokenize
    * differently from the oracles' string_split_regex('\s+'). */
  def words(text: Column): Column =
    // filter, not the blank-test special case alone: Spark's trim() strips
    // only ASCII SPACE, so "foo bar\n" split to ["foo","bar",""] and
    // "\nfoo" to ["","foo"] — boundary empties diluted every word-count
    // denominator and surfaced "" as a token (DuckDB oracles mirror with
    // list_filter over the same split)
    filter(split(trim(text), WsRun), w => length(w) > 0)

  /** The RE2/DuckDB `\s` ASCII set — space \t \n \f \r — as a Java regex
    * class. Java's own `\s` ALSO matches VT (U+000B); RE2's does not.
    * Every text regex mirrored by a DuckDB '\s' oracle (tokenizing splits,
    * whitespace collapses, the gopher line matchers) must use THIS class,
    * or VT-bearing documents score differently between the engines. */
  private[llm] val WsCls = "[ \\t\\n\\f\\r]"
  private[llm] val WsRun = WsCls + "+"

  /** Exact whitespace token count. */
  def wordCount(text: Column): Column = size(words(text)).cast("long")

  /** First 32 md5 bits of a token, mod `n` — THE hashed-feature bucket
    * function shared by [[linearScore]], [[hashedFeatures]] and
    * [[graft.llm.Curation.dsirWeights]]. One definition: a 16-bit prefix
    * here once left every bucket >= 2^16 permanently empty, and the three
    * inline copies had to be found and fixed one by one. */
  private[llm] def md5Bucket(token: Column, n: Int): Column =
    md5BucketOfHex(md5(token), n)

  /** [[md5Bucket]] over an already-computed md5 hex column (callers that
    * also derive other bits from the same digest bind it once). */
  private[llm] def md5BucketOfHex(hex: Column, n: Int): Column =
    conv(substring(hex, 1, 8), 16, 10).cast("long") % n

  /** THE deterministic ordered-fold skeleton (the md5Bucket lesson, same
    * class): collect_list order is partition-dependent, so every
    * bit-exact aggregate sum folds a key-sorted struct list instead.
    * `step` receives (acc, struct) and addresses the payload by the field
    * name it was bound with — one definition of the sort/fold mechanics
    * for [[bigramLmScore]], [[linearScore]] and
    * [[graft.llm.Search.bm25TopK]]. */
  private[llm] def orderedFold(key: Column, payload: Column)(
      step: (Column, Column) => Column): Column =
    aggregate(array_sort(collect_list(struct(key, payload))), lit(0.0), step)

  /** BPE-ish token estimate: word-piece count where each word contributes
    * ceil(len/4) pieces plus standalone punctuation; a cheap deterministic
    * stand-in for a real tokenizer, computed per-row without UDFs. */
  def tokenEstimate(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, s) => acc + ((length(s) + lit(3)) / lit(4)).cast("long"))

  /** C4-style blocklist signals: per-document count/ratio of NORMALIZED
    * words appearing in `blocklist`, plus the any-hit flag the C4 cleaning
    * recipe drops documents on ("bad words" filter). Matching is on
    * [[normalize]]d word tokens — case/punctuation variants of a listed
    * word all hit — and the list rides into codegen as one literal array
    * (no join, no shuffle; a real deployment's list is a few thousand
    * entries, well inside literal/broadcast territory). NULL text reads
    * as empty (0 words, 0 hits, ratio 0.0, not flagged). */
  def blocklistStats(df: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklistStats: empty blocklist")
    // tokens are matched NORMALIZED, so the entries must be too — a raw
    // 'Viagra' would otherwise never hit the normalized token 'viagra'.
    // An entry that normalizes to empty or to multiple words can never
    // match a single token: refuse loudly instead of silently never firing
    val normed = blocklist.map(e => e.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^\\p{L}\\p{N}\\s\\p{Z}\\x85]", "")
      .replaceAll("[\\s\\p{Z}\\x85]+", " ").trim)
    normed.zip(blocklist).foreach { case (n, raw) =>
      require(n.nonEmpty && !n.contains(' '),
        s"blocklistStats: entry '$raw' normalizes to '$n' and can never " +
          "match a single normalized token")
    }
    val list = normed.distinct
    // bind the tokenization ONCE: the lambda-bearing filter excludes this
    // expression tree from subexpression elimination, so inlining it into
    // all five outputs re-ran the normalize+split per reference
    df.select(col(idCol),
      words(normalize(coalesce(col(textCol), lit("")))).as("__w"))
      .select(col(idCol), size(col("__w")).cast("long").as("n_words"),
        size(filter(col("__w"), x => array_contains(typedLit(list), x)))
          .cast("long").as("n_hits"))
      .select(col(idCol), col("n_words"), col("n_hits"),
        when(col("n_words") === 0, lit(0.0))
          .otherwise(col("n_hits").cast("double") / col("n_words").cast("double"))
          .as("hit_ratio"),
        (col("n_hits") > 0).as("flagged"))
  }

  /** One PII category: a regex (kept to the Java/RE2 COMMON dialect subset —
    * char classes, bounded/unbounded repetition, \b, \d; no lookaround, no
    * backrefs — so external engines can replay redaction exactly) and its
    * replacement token. */
  case class PiiPattern(name: String, regex: String, replacement: String)

  /** Default redaction set. ORDER MATTERS and is part of the contract:
    * categories are applied sequentially, each counting + replacing on the
    * text as left by the previous one (email before the digit patterns so
    * a phone inside an address-like string can't double-count; SSN's 3-2-4
    * shape before phone's 3-3-4; cards require separators so 16-digit ids
    * don't trip them). */
  val defaultPiiPatterns: Seq[PiiPattern] = Seq(
    PiiPattern("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    PiiPattern("card", "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b", "<CARD>"),
    PiiPattern("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    PiiPattern("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    PiiPattern("ipv4", "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IPV4>"))

  /** PII scrubbing for corpus curation: returns the input columns with
    * `textCol` replaced by its redacted form plus one `n_<category>` count
    * per pattern (matches found at that category's turn in the sequence).
    * Pure per-row map of codegen'd regexp expressions — no shuffle, no UDF;
    * at 100 TB this is scan-bound like every other per-document op. */
  def redactPii(df: DataFrame, textCol: String,
      patterns: Seq[PiiPattern] = defaultPiiPatterns): DataFrame = {
    val redacted = patterns.foldLeft(df) { (acc, p) =>
      acc
        .withColumn(s"n_${p.name}",
          size(regexp_extract_all(col(textCol), lit(p.regex), lit(0))).cast("long"))
        .withColumn(textCol,
          regexp_replace(col(textCol), p.regex, p.replacement))
    }
    redacted
  }

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

  /** Two-projection language ID: materializes the per-language marker-count
    * struct ONCE (a single aggregate pass over the normalized word array)
    * and derives the argmax from cheap struct-field references. Inlining
    * [[langId]] as one expression re-runs the normalize+split+filter lambda
    * per WHEN/greatest reference — lambda-bearing expressions are excluded
    * from Spark's subexpression elimination, so a single-column langId
    * costs up to ~9 normalization passes per language; this helper does
    * exactly one (CollapseProject keeps the multi-referenced non-cheap
    * alias in its own projection, same pattern as [[textStats]]). Prefer
    * this in pipelines; [[langId]] remains for single-expression contexts. */
  def withLangId(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val zero = struct(langMarkers.map { case (l, _) => lit(0L).as(l) }: _*)
    val counts = aggregate(words(normalize(col(textCol))), zero,
      (acc, s) => struct(langMarkers.map { case (l, ms) =>
        (acc(l) + when(ms.map(m => s === lit(m)).reduce(_ || _), 1L)
          .otherwise(0L)).as(l)
      }: _*))
    val sc = col("__lang_counts")
    val best = langMarkers.map { case (l, _) => sc(l) }
      .reduce((a, b) => greatest(a, b))
    val pick = langMarkers.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(sc(l) === best && best > 0, lit(l)).otherwise(acc)
    }
    df.withColumn("__lang_counts", counts)
      .withColumn(outCol, pick)
      .drop("__lang_counts")
  }

  /** English stopword set used by the Gopher-style quality gate (a
    * "contains at least k of these" rule, not a full stopword list). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher-style composite quality rules (Rae et al. 2021 §A1.1), the
   * standard pre-training document gate, as one shuffle-free projection:
   *
   *  - `n_words`, `mean_word_len` — length family
   *  - `frac_alpha_words` — fraction of words containing an alphabetic char
   *  - `symbol_word_ratio` — '#' and ellipsis ('...'/'…') hits per word
   *  - `frac_bullet_lines` / `frac_ellipsis_lines` — lines starting with a
   *    bullet ('-', '*', '•') / ending with an ellipsis
   *  - `n_stopwords` — DISTINCT [[gopherStopwords]] present (the A1.1
   *    rule counts membership, not hit multiplicity)
   *  - `quality_pass` — the conjunction with Gopher's thresholds
   *
   * Tokenization is the raw whitespace-run split (punctuation KEPT — the
   * symbol rules need it), lowercased only for the stopword test. Every
   * ratio is a single IEEE division of exact integer counts, so external
   * engines can replay the gate bit-for-bit.
   */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL text reads as empty: un-coalesced, every stat would go NULL
    // (ANSI) and quality_pass=NULL rows vanish from BOTH filter(pass) and
    // filter(!pass) — the pass/fail partition must cover the corpus
    val t = coalesce(col(textCol), lit(""))
    val w = col("__gw")
    val lines = col("__gl")
    val nw = size(w).cast("long")
    val nl = size(lines).cast("long")
    val alphaWords = size(filter(w, s => s.rlike("[A-Za-z]"))).cast("long")
    val symbolHits = size(regexp_extract_all(t, lit("#|\\.\\.\\.|…"), lit(0))).cast("long")
    // WsCls, not Java \s: the oracle's RE2 '\s' excludes VT (U+000B)
    val bulletLines = size(filter(lines, l => l.rlike(s"^$WsCls*[-*•]"))).cast("long")
    val ellipsisLines = size(filter(lines, l => l.rlike(s"(\\.\\.\\.|…)$WsCls*$$"))).cast("long")
    // DISTINCT stop words present, not hit multiplicity: the cited rule
    // (Rae et al. 2021 A1.1, as implemented in DataTrove/Dolma) requires
    // at least two OF the stop words — a keyword-stuffed doc repeating
    // only "the" twenty times previously scored n_stopwords=20 and passed
    val stopHits = size(array_distinct(filter(transform(w, s => lower(s)),
      s => gopherStopwords.map(m => s === lit(m)).reduce(_ || _)))).cast("long")
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(0.0)).otherwise(num.cast("double") / den.cast("double"))
    // mean word length from the BOUND token array — meanWordLen(t) would
    // re-run the trim+regex split three more times per row (size guard,
    // aggregate, divisor); same expression shape, so values are identical
    val mwl = when(size(w) === 0, lit(0.0)).otherwise(
      aggregate(transform(w, s => length(s).cast("double")), lit(0.0),
        (a, x) => a + x) / size(w).cast("double"))
    df.select(col(idCol), t.as(textCol),
        words(t).as("__gw"),
        // boundary newline runs stripped before the line split: nearly
        // every web document ends in "\n", and the phantom empty final
        // line diluted the bullet/ellipsis denominators enough to flip
        // the gate on boundary docs
        split(regexp_replace(t, "^\\n+|\\n+$", ""), "\n", -1).as("__gl"))
      .select(col(idCol),
        nw.as("n_words"),
        mwl.as("mean_word_len"),
        ratio(alphaWords, nw).as("frac_alpha_words"),
        ratio(symbolHits, nw).as("symbol_word_ratio"),
        ratio(bulletLines, nl).as("frac_bullet_lines"),
        ratio(ellipsisLines, nl).as("frac_ellipsis_lines"),
        stopHits.as("n_stopwords"))
      .withColumn("quality_pass",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("frac_alpha_words") >= 0.8 &&
          col("symbol_word_ratio") <= 0.1 &&
          col("frac_bullet_lines") <= 0.9 &&
          col("frac_ellipsis_lines") <= 0.3 &&
          col("n_stopwords") >= 2)
  }

  /** Word n-grams of `w` (a string array) joined with single spaces; fewer
    * than `n` words yields an empty array. Pure per-row array construction —
    * no explode, no shuffle. */
  def ngrams(w: Column, n: Int): Column = {
    require(n >= 1, "ngrams: n must be >= 1")
    if (n == 1) w
    else when(size(w) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
  }

  /** Highest multiplicity of any element of `arr`, computed per-row as the
    * longest run of equal adjacent values after an array_sort — a single
    * aggregate lambda over the sorted array, so the whole computation stays
    * inside the row (no explode + two-level groupBy, no shuffle). Empty
    * arrays yield 0. */
  def maxMultiplicity(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc("prev").isNotNull && acc("prev") === x,
          acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Gopher-style repetition signals, per document and shuffle-free:
    * distinct-word ratio and the fraction of mass taken by the single most
    * frequent word / bigram / trigram. High top-fraction or low distinct
    * ratio flags boilerplate and degenerate repetition. Ratios are 0.0 (not
    * NULL/NaN) when the document is too short to have the n-gram at all, so
    * threshold filters behave. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL text = no words (the doc's 0.0-not-NULL ratio promise must
    // hold for NULL input too, or threshold filters drop the row from
    // both sides of the gate)
    df.select(col(idCol), words(coalesce(col(textCol), lit(""))).as("__w"))
      .select(col(idCol), col("__w"),
        size(col("__w")).cast("long").as("n_words"),
        ngrams(col("__w"), 2).as("__bg"),
        ngrams(col("__w"), 3).as("__tg"))
      .select(col(idCol), col("n_words"),
        size(array_distinct(col("__w"))).cast("long").as("__d"),
        maxMultiplicity(col("__w")).as("__mw"),
        size(col("__bg")).cast("long").as("__nb"),
        maxMultiplicity(col("__bg")).as("__mb"),
        size(col("__tg")).cast("long").as("__nt"),
        maxMultiplicity(col("__tg")).as("__mt"))
      .select(col(idCol), col("n_words"),
        when(col("n_words") === 0, 0.0)
          .otherwise(col("__d") / col("n_words")).as("distinct_word_ratio"),
        when(col("n_words") === 0, 0.0)
          .otherwise(col("__mw") / col("n_words")).as("top_word_frac"),
        when(col("__nb") === 0, 0.0)
          .otherwise(col("__mb") / col("__nb")).as("top_bigram_frac"),
        when(col("__nt") === 0, 0.0)
          .otherwise(col("__mt") / col("__nt")).as("top_trigram_frac"))
  }

  /**
   * Language-model-lite familiarity scoring: the fraction of a document's
   * word bigrams (with multiplicity) whose corpus-wide occurrence count is
   * below `minCount`. A high rare-bigram ratio flags the same documents a
   * KenLM perplexity filter would — OCR noise, gibberish, boilerplate-free
   * but incoherent text — with integer counts and one exact division per
   * doc, so any engine replays it bit-for-bit (no log-prob float-summation
   * order to disagree on).
   *
   * Scale shape: explode bigrams → one hash aggregation for corpus counts
   * → equi-join back (build side is DISTINCT bigrams; frequency skew sits
   * on the probe side) → per-doc regroup. Documents with no bigram
   * (< 2 words) return ratio 0.0 — they are POOR evidence of rarity, and
   * 0.0-not-NULL keeps threshold filters total.
   *
   * Tokenizes the RAW text (the gopherQuality posture), so case and
   * punctuation variants count as distinct bigrams — pass a
   * pre-[[normalize]]d column when folded statistics are wanted (the
   * bigramLmScore/bm25 family normalizes internally; this op leaves the
   * choice to the caller because rarity of the raw surface form is itself
   * a signal for OCR noise).
   */
  def rareBigramRatio(df: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    // words bound as an attribute before ngrams: the ngram lambda reads the
    // words array per ELEMENT, and a free split expression there is
    // re-evaluated once per gram on the interpreted HOF path (the
    // shingles()/winnowFingerprints fix, same mechanism)
    val grams = df.select(col(idCol), words(col(textCol)).as("__w"))
      .select(col(idCol), explode_outer(ngrams(col("__w"), 2)).as("__g"))
    val counts = grams.filter(col("__g").isNotNull)
      .groupBy("__g").agg(count(lit(1)).as("__cnt"))
    // left join: bigram-less docs (NULL __g from explode_outer) survive
    grams.join(counts, Seq("__g"), "left")
      .groupBy(idCol)
      .agg(
        count(col("__g")).as("n_bigrams"),
        sum(when(col("__cnt") < minCount, 1L).otherwise(0L)).as("n_rare"))
      .select(col(idCol), col("n_bigrams"), col("n_rare"),
        when(col("n_bigrams") === 0, 0.0)
          .otherwise(col("n_rare") / col("n_bigrams")).as("rare_bigram_ratio"))
  }

  /** Corpus-level top-k most frequent word n-grams — the building block for
    * boilerplate/filter lists. One explode + one aggregation (map-side
    * partial combine) + a TakeOrderedAndProject top-k; ties break on the
    * gram text so the result is deterministic. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    // words bound before ngrams (per-element re-split otherwise — see
    // rareBigramRatio); explode_outer + IS NOT NULL rather than explode so
    // InferFiltersFromGenerate can't re-substitute the pipeline into a
    // size(...)>0 filter below the binding projection (grams are concat_ws
    // output, never null — only the short-doc empty-array padding rows
    // die, exactly what plain explode dropped)
    df.select(words(col(textCol)).as("__w"))
      .select(explode_outer(ngrams(col("__w"), n)).as("gram"))
      .filter(col("gram").isNotNull)
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(k)

  /** Per-document text statistics. The token array is materialized ONCE in
    * a lower projection and both word stats derive from that alias — inlining
    * `words(t)` into each stat would run the whitespace-run split per
    * expression (CollapseProject keeps multi-referenced non-cheap aliases,
    * so the two projections stay split in the optimized plan). */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL text reads as empty (0 chars / 0 words / 0 tokens), matching
    // the package-wide NULL rule (blocklistStats, chunkOverlap, spans)
    val t = coalesce(col(textCol), lit(""))
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

  /**
   * Markup stripping for web-scraped corpora: remove script/style blocks
   * WITH their payload (executable/styling text is never prose), drop all
   * remaining tags, decode the five XML entities + numeric escapes'
   * common subset, collapse the whitespace the removals leave behind.
   * Pure regexp/replace column expressions — the exact chain is the
   * contract, replayable by any engine with POSIX regexps (no HTML5
   * parser semantics promised; malformed-markup edge cases degrade to
   * leaving text in place, never dropping prose).
   *
   * The generic tag pattern requires a TAG-SHAPED start (`</?letter`,
   * `<!`, `<?`): the naive `<[^>]+>` matched from any bare '&lt;' to the
   * next '&gt;' — on markup-free prose like "price &lt; 100 and rating
   * &gt; 4" it swallowed "&lt; 100 and rating &gt;", exactly the
   * dropped-prose failure the contract above forbids. HTML-parser
   * alignment: browsers too treat '&lt;' followed by a non-letter as
   * literal text, not a tag open.
   */
  def stripMarkup(text: Column): Column = {
    // (?is): case-insensitive, dot-matches-newline for multi-line blocks
    val noScript = regexp_replace(text, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment,
      "(?s)<(/?[a-zA-Z][^<>]*|[!?][^<>]*)>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&") // &amp; LAST: it may encode the others
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, WsRun, " ")) // RE2-agreeing class, see WsRun
  }

  /**
   * Self-trained bigram language-model fluency score (the CCNet/KenLM
   * quality-filter shape with the corpus itself as the model): per
   * document, the mean conditional probability of its word bigrams,
   * P(w2|w1) = corpusCount(w1 w2) / corpusCount(w1-as-prefix). Documents
   * full of corpus-typical word transitions score high; gibberish and
   * boilerplate-free noise score near 1/|V|. Because the model is trained
   * on the same corpus it scores, every document bigram has count >= 1 —
   * no smoothing decision leaks into the contract.
   *
   * Cross-engine exactness: every probability is ONE IEEE division of two
   * exact integer counts, the per-document sum folds in POSITION order
   * (collect_list -> array_sort by the unique position, then an ordered
   * fold), and the final mean is one more division — any engine replays
   * the doubles bit-for-bit.
   *
   * Scale shape: one bigram explode feeding two hash aggregations (the
   * model), two equi-joins back (the count sides are DISTINCT bigrams /
   * prefixes, so a billion-fold-repeated stopword pair is ONE build row
   * and its frequency skew parallelizes on the probe side), one per-doc
   * regroup. Nothing driver-side; the trained model never leaves the
   * executors.
   */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // normalize+split bound as an attribute: the bigram lambda reads the
    // words array twice per ELEMENT (element_at i+1/i+2), and a free
    // expression there re-runs the whole normalize+split per bigram on the
    // interpreted HOF path (the shingles()/winnowFingerprints fix).
    // explode_outer + IS NOT NULL rather than explode so
    // InferFiltersFromGenerate can't re-substitute the pipeline into a
    // size(...)>0 filter below the binding projection (bigram elements are
    // structs, never null — only the <2-word empty-array padding rows die,
    // exactly what plain explode dropped).
    val w = col("__wlm")
    val bigrams = when(size(w) < 2,
        array().cast("array<struct<pos:int,w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(0), size(w) - 2), i =>
        struct(i.cast("int").as("pos"),
          element_at(w, i + 1).as("w1"), element_at(w, i + 2).as("w2"))))
    val bi = df
      .select(col(idCol), words(normalize(col(textCol))).as("__wlm"))
      .select(col(idCol), explode_outer(bigrams).as("__b"))
      .filter(col("__b").isNotNull)
      .select(col(idCol), col("__b.pos").as("__pos"),
        col("__b.w1").as("__w1"), col("__b.w2").as("__w2"))
    val c2 = bi.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c2"))
    val c1 = bi.groupBy("__w1").agg(count(lit(1)).as("__c1"))
    val scored = bi.join(c2, Seq("__w1", "__w2")).join(c1, Seq("__w1"))
      .select(col(idCol), col("__pos"),
        (col("__c2").cast("double") / col("__c1").cast("double")).as("__p"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        (orderedFold(col("__pos"), col("__p"))((acc, x) => acc + x("__p")) /
          count(lit(1)).cast("double")).as("lm_score"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0.0)).as("lm_score"))
  }

  /**
   * TF-IDF keyword extraction: each document's top-`k` terms by
   * tf × (N / df) — the document-side complement of [[Search.bm25TopK]]
   * (query retrieval). The "rational idf" form (a plain count ratio, no
   * logarithm) keeps every score ONE IEEE division of exact integers —
   * (tf · N) / df — so external engines replay scores bit-for-bit; the
   * ln() shape differs only monotonically and would cost cross-engine
   * libm parity. Ties break alphabetically for a deterministic keyword
   * list.
   *
   * Scale shape: one token explode → per-(doc, term) tf aggregation →
   * DISTINCT-term document frequencies (the million-fold stopword is one
   * build row; skew parallelizes on the probe side) → equi-join → one
   * per-doc top-k window. No driver state, no vocabulary collect.
   */
  def tfidfTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"tfidfTerms: k=$k")
    // count + scoring both consume the corpus: one RDD-persisted
    // evaluation (the Dedup.resolveDocFreqCap discipline — a
    // non-deterministic upstream re-evaluated for the scoring pass could
    // disagree with the N the scores embed); already-persisted inputs are
    // the caller's cache
    val src =
      if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
      else {
        val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.sparkSession.createDataFrame(rdd, df.schema)
      }
    val n = src.count() // one count job; N is part of the score contract
    val toks = src.select(col(idCol), explode(words(normalize(col(textCol)))).as("__w"))
    val tf = toks.groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("__w").agg(count(lit(1)).as("__df"))
    val scored = tf.join(dfreq, Seq("__w"))
      .withColumn("score",
        (col("__tf") * lit(n)).cast("double") / col("__df").cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("__w").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("__w").as("term"), col("rnk"), col("score"))
  }

  /**
   * Apply a PRETRAINED linear text classifier at corpus scale — the
   * fastText/quality-classifier deployment shape (training happens
   * offline on a small labeled set; what the 100 TB pipeline actually
   * runs is this dot product): `score = bias + Σ_b count_b · weights(b)`
   * over md5-hashed unigram buckets (the [[hashedFeatures]] bucket
   * function; `weights.length` fixes the bucket count). The per-document
   * fold runs in ascending-bucket order, so the double score replays
   * bit-for-bit in any engine given the same weights.
   *
   * Scale shape: one token explode + one (doc, bucket) count aggregation
   * + a codegen fold against a literal weight array — no joins, no
   * vocabulary, no driver state.
   */
  def linearScore(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], bias: Double = 0.0): DataFrame = {
    require(weights.length >= 2, s"linearScore: ${weights.length} weights")
    val n = weights.length
    val toks = df.select(col(idCol), explode(words(normalize(col(textCol)))).as("__w"))
      .select(col(idCol), md5Bucket(col("__w"), n).as("__b"))
    val wArr = typedlit(weights.toSeq)
    val scored = toks.groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(idCol)
      .agg(sum(col("__c")).as("n_tokens"),
        (lit(bias) + orderedFold(col("__b"), col("__c"))(
          (acc, x) => acc + x("__c").cast("double") *
            element_at(wArr, x("__b").cast("int") + 1))).as("score"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score"), lit(bias)).as("score"))
      .withColumn("pass", col("score") > 0.0)
  }

  /**
   * Feature hashing (the "hashing trick", Weinberger et al. 2009): sparse
   * signed bag-of-words features in a fixed `numBuckets`-dim space with NO
   * vocabulary pass — bucket and sign both derive from md5 of the token, so
   * the featurization is stateless, embarrassingly parallel, and any engine
   * can replay it. Output is the sparse long format (id, bucket, weight):
   * weight = Σ ±1 over the document's tokens landing in the bucket (the
   * signed sum makes collisions cancel in expectation instead of biasing
   * counts upward). Documents with no tokens emit no rows.
   *
   * Scale shape: one explode + one (id, bucket) hash aggregation with
   * map-side partial combine — the same cost as a word count; no
   * vocabulary broadcast, no driver state, dimensionality fixed up front
   * regardless of corpus vocabulary growth (the point of the trick at
   * 100 TB: a real vocabulary pass over web text is billions of terms).
   */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 2, s"hashedFeatures: numBuckets=$numBuckets")
    df.select(col(idCol), explode(words(normalize(col(textCol)))).as("__w"))
      .withColumn("__m", md5(col("__w")))
      // bucket = md5Bucket (first 32 md5 bits); sign = md5 bit 33 —
      // independent hex ranges so bucket and sign stay uncorrelated
      .select(col(idCol),
        md5BucketOfHex(col("__m"), numBuckets).as("bucket"),
        when(conv(substring(col("__m"), 9, 1), 16, 10).cast("long") % 2 === 0,
          lit(1L)).otherwise(lit(-1L)).as("__sign"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__sign")).as("weight"))
  }
}
