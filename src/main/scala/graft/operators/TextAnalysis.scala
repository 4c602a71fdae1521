package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs): each operator is a per-row expression, so it runs inside
  * whole-stage codegen with zero shuffles — the shape that scales
  * linearly to 100 TB.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  /** Ratio of alphabetic chars to total chars. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Ratio of digit chars to total chars. */
  def digitRatio(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Ratio of punctuation chars to total chars. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length (chars of non-space text / token count). */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1L)).cast("double")

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are")

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(
      text: Column,
      stopwords: Seq[String] = EnglishStopwords): Column = {
    val stops = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stops, t))).cast("double") /
      greatest(tokenCount(text), lit(1L)).cast("double")
  }

  /** Composite quality score in [0,1]: favors alphabetic, multi-word,
    * low-digit, moderately-punctuated text (C4/Gopher-style heuristics
    * reduced to a single monotone score).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val alpha = alphaRatio(text)
    val digitPenalty = lit(1.0) - least(digitRatio(text) * 4.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    (lenScore * 0.25 + alpha * 0.35 + digitPenalty * 0.2 + punctPenalty * 0.2)
  }

  // --- language ID: tiny stopword-profile n-gram heuristic ------------

  private val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "del", "para", "con", "por"))

  /** Predicted language code; `und` when no profile matches.
    * CJK codepoints short-circuit to `zh`. Pure expression: the per-
    * language scores are array-membership counts over the token array.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangProfiles.toSeq.sortBy(_._1).map { case (code, words) =>
      val profile = array(words.map(lit): _*)
      struct(
        size(filter(toks, t => array_contains(profile, t))).as("score"),
        lit(code).as("code"))
    }
    val best = array_max(array(scores: _*))
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best.getField("score") > 0, best.getField("code"))
      .otherwise(lit("und"))
  }

  // --- fingerprinting -------------------------------------------------

  /** Word w-shingles joined with single spaces. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) < w, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (w - 1)),
        i => array_join(slice(toks, i, lit(w)), " ")))
  }

  /** 64-bit whole-document fingerprint (content hash, order-sensitive). */
  def docFingerprint(text: Column): Column =
    xxhash64(array_join(tokens(text), " "))

  /** Rolling (winnowing-style) fingerprint: min shingle hash — equal
    * fingerprints are strong near-dup candidates even when documents
    * differ in a suffix. */
  def minShingleFingerprint(text: Column, w: Int = 3): Column =
    array_min(transform(shingles(text, w), s => xxhash64(s)))
}
