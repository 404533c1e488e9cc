package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * normalization, tokenization, shingling, language ID, quality scoring,
  * token counting, and content fingerprinting.
  *
  * Everything is a pure `Column` combinator (no UDFs), so the whole
  * pipeline stays inside whole-stage codegen and distributes with the
  * scan — the per-document cost is constant and there is no shuffle
  * until an aggregation asks for one. That is the property that lets
  * these run over 100 TB of documents as a single map stage.
  */
object text {

  /** Canonical text normalization: lowercase, trim, collapse runs of
    * whitespace to single spaces. The shared first step of dedup keys,
    * tokenization and fingerprints — two documents that differ only in
    * case/spacing normalize identically.
    */
  def normalizeText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Whitespace tokenization of normalized text. */
  def tokenize(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Distinct word n-grams ("shingles") of a token array, each n-gram
    * space-joined. The unit set for MinHash/Jaccard near-dedup. Empty
    * when the document has fewer than n tokens.
    *
    * Backed by the native `NGramsExpr` kernel — the equivalent
    * `array_distinct(transform(sequence, i -> concat_ws(slice)))`
    * combinator evaluates interpreted (higher-order functions skip
    * codegen) and was the top CPU line of the dedup pipeline; the
    * native expression emits the same values in first-occurrence order
    * from one tight loop. [[ngramsColumn]] keeps the combinator form as
    * the executable specification (TextSpec proves them equal).
    */
  def ngrams(toks: Column, n: Int): Column =
    graft.plans.NativeHashes.nGrams(toks, n)

  /** Reference combinator formulation of [[ngrams]]. */
  def ngramsColumn(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Prefix fingerprint: the first k tokens space-joined — a cheap exact
    * dedup key that collapses documents sharing their opening.
    */
  def prefixKey(toks: Column, k: Int): Column =
    concat_ws(" ", slice(toks, 1, k))

  // -------------------------------------------------------------------
  // Language identification (n-gram/stopword heuristic)

  /** Tiny per-language function-word profiles. Deliberately small and
    * fixed: language ID here is a deterministic, engine-portable
    * heuristic (count profile hits, argmax), not a model.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un"),
    "es" -> Seq("el", "los", "las", "y", "un", "una"))

  /** Occurrences (with repeats) of any of `words` in the token array.
    * Backed by the native `ProfileCountExpr` kernel (the interpreted
    * `filter` lambda × 4 profiles was the text-metrics hot loop);
    * [[stopwordCountColumn]] is the combinator spec (TextSpec proves
    * them equal).
    */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    graft.plans.NativeHashes.profileCount(toks, words)

  /** Reference combinator formulation of [[stopwordCount]]. */
  def stopwordCountColumn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  /** Heuristic language ID: argmax of profile hit-counts, earlier
    * profile wins ties, "und" (undetermined) when no profile scores.
    */
  def langId(toks: Column): Column = {
    val best = langProfiles.foldLeft((lit("und"), lit(0L))) {
      case ((bestLang, bestScore), (lang, words)) =>
        val s = stopwordCount(toks, words)
        (when(s > bestScore, lit(lang)).otherwise(bestLang),
          when(s > bestScore, s).otherwise(bestScore))
    }
    best._1
  }

  // -------------------------------------------------------------------
  // Quality scoring

  /** Fraction of characters outside [a-z0-9 ] in normalized text. */
  def punctRatio(c: Column): Column = {
    val n = normalizeText(c)
    when(length(n) > 0,
      (length(n) - length(regexp_replace(n, "[^a-z0-9 ]", "")))
        .cast("double") / length(n))
      .otherwise(lit(0.0))
  }

  /** Fraction of tokens that are English function words. */
  def stopwordRatio(toks: Column): Column =
    when(size(toks) > 0,
      stopwordCount(toks, langProfiles.head._2).cast("double") / size(toks))
      .otherwise(lit(0.0))

  /** Composite document quality in [0,1]: length saturation (100 tokens
    * = full marks), low punctuation noise, natural-language function
    * words present. The weights are fixed so the score is reproducible
    * across engines and runs.
    */
  def qualityScore(c: Column): Column = {
    val toks = tokenize(c)
    round(
      lit(0.4) * least(size(toks).cast("double") / 100.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - punctRatio(c)) +
        lit(0.3) * stopwordRatio(toks), 6)
  }

  // -------------------------------------------------------------------
  // Token counting

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(tokenize(c)).cast("long")

  /** BPE-ish token count: letter runs, digit runs, and each remaining
    * symbol count as one token — a deterministic proxy for subword
    * tokenizer cost accounting.
    */
  def tokenCountBpe(c: Column): Column =
    regexp_count(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")

  // -------------------------------------------------------------------
  // Fingerprinting

  /** Rolling polynomial content hash over the characters of normalized
    * text: h = (h*31 + codepoint(ch)) mod p. Engine-portable (the same
    * fold is expressible in any SQL dialect with list folds) and
    * stable, so it can key exact dedup across heterogeneous pipelines.
    *
    * Backed by the native `RollingHashExpr` kernel — the per-character
    * combinator fold ([[fingerprintColumn]]) evaluates interpreted and
    * was the top CPU line of the q38 prep pipeline; TextSpec proves the
    * two equal.
    */
  def fingerprint(c: Column, p: Long = 1000000007L): Column =
    graft.plans.NativeHashes.rollingHash(normalizeText(c), p)

  /** Reference combinator formulation of [[fingerprint]]. Empty splits
    * are filtered because Java-regex split keeps a trailing empty
    * element.
    */
  def fingerprintColumn(c: Column, p: Long = 1000000007L): Column =
    aggregate(
      filter(split(normalizeText(c), ""), ch => length(ch) > 0),
      lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch), lit(p)))
}
