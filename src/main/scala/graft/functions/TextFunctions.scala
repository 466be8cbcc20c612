package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions` so the
  * hot path stays inside whole-stage codegen — no Scala UDF boxing. These
  * scale linearly with no shuffle: they are per-row expressions that run
  * inside the parquet scan stage.
  */
object TextFunctions {

  /** Whitespace tokenization (reference analogue: Tokenize operator,
    * reference: pkg/processing/default_operators.go:264-268). Leading /
    * trailing whitespace yields no empty tokens.
    *
    * trim-then-split instead of split-then-filter(lambda): the filter
    * lambda is an interpreted higher-order function, while trim/split/
    * when are codegen'd — this keeps every text query's hot path inside
    * whole-stage codegen. Interior empty tokens cannot occur with a \\s+
    * separator, so the results are identical.
    */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles: ["a b c", "b c d", ...] for n-gram dedup. */
  def wordShingles(text: Column, n: Int): Column =
    graft.expressions.WordShingles(text, n)

  /** Character n-grams of the full string (for language ID / fuzzy dedup). */
  def charNgrams(text: Column, n: Int): Column = {
    val len = length(text)
    transform(sequence(lit(1), greatest(len - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))
  }

  // --- quality scoring -----------------------------------------------

  private[graft] val StopWords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => lower(t).isInCollection(StopWords)))

  def stopwordRatio(text: Column): Column =
    when(tokenCount(text) > 0,
      stopwordCount(text).cast("double") / tokenCount(text))
      .otherwise(lit(0.0))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}-]", ""))

  def punctRatio(text: Column): Column =
    when(length(text) > 0, punctCount(text).cast("double") / length(text))
      .otherwise(lit(0.0))

  def meanWordLength(text: Column): Column =
    when(tokenCount(text) > 0,
      aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
        .cast("double") / tokenCount(text))
      .otherwise(lit(0.0))

  /** Composite heuristic quality score in [0,1]: rewards moderate length,
    * presence of stopwords (fluent prose) and penalizes punctuation soup.
    * Deliberately simple and branch-free — a per-row codegen'd expression.
    */
  def qualityScore(text: Column): Column =
    floor(qualityRaw(text) * 10000 + 0.5) / 10000

  /** Integer-quantized quality (floor(raw*10000 + 0.5), LongType) for
    * MEMBERSHIP CUTS: a gate written `qualityScoreQ(t) >= 6000` compares
    * exact integers on both engines, with no double comparison at the
    * cut. qualityScore == qualityScoreQ / 10000 bit-for-bit.
    */
  def qualityScoreQ(text: Column): Column =
    floor(qualityRaw(text) * 10000 + 0.5)

  private def qualityRaw(text: Column): Column = {
    // one text scan via the native profile; the score arithmetic below
    // is the IDENTICAL sequence of double ops as the original composed
    // form, so oracle-compared values are bit-equal
    val p = graft.expressions.TextProfileExpr(text)
    val nTok = p.getField("n_tokens")
    val lenScore = least(nTok.cast("double") / 50.0, lit(1.0))
    val stopRatio = when(nTok > 0,
      p.getField("n_stop").cast("double") / nTok).otherwise(lit(0.0))
    val stopScore = least(stopRatio * 4.0, lit(1.0))
    val punctRatio = when(p.getField("n_chars") > 0,
      p.getField("n_punct").cast("double") / p.getField("n_chars"))
      .otherwise(lit(0.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio * 5.0, lit(0.0))
    (lenScore + stopScore + punctPenalty) / 3.0
  }

  // --- BPE-ish token estimate ----------------------------------------

  /** Approximate LLM-token count: whitespace words plus an extra token per
    * 4 chars beyond the first 4 of each word (long words split into
    * subwords), plus punctuation runs. A cheap stand-in for a real BPE
    * vocab that still scales as a pure expression.
    */
  def approxBpeTokenCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + greatest(ceil(length(t).cast("double") / 4.0), lit(1L))) +
      punctCount(text)

  // --- language identification ---------------------------------------

  private[graft] val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "with", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "que", "por", "con", "para"),
    "it" -> Seq("il", "la", "che", "di", "non", "una", "per", "sono", "con", "del"))

  /** N-gram/stopword-heuristic language ID. Scores each candidate language
    * by marker-word hit count over the token stream and returns the argmax.
    * Ties resolve to the lexicographically GREATEST language code (the
    * `array_max` over `struct(score, lang)` compares `lang` when scores
    * tie — e.g. an en/es tie yields "es"); a language wins over "unknown"
    * only with >=1 hit. Pure expression — no UDF, no shuffle.
    */
  def langId(text: Column): Column =
    graft.expressions.LangIdExpr(text)

  // --- fingerprinting --------------------------------------------------

  /** Content fingerprint via polynomial rolling hash over the characters:
    * acc = (acc * 257 + code) mod 1_000_000_007. The mod keeps every
    * intermediate below 2^38 (ANSI-safe, no wraparound) and makes the
    * hash reproducible in any engine with 64-bit integer SQL arithmetic.
    * Stable across partitions and runs; usable as a dedup key that is
    * cheaper to shuffle than the full text.
    */
  def fingerprint(text: Column): Column =
    graft.expressions.FingerprintExpr(text)
}
