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

  // --- language ID: script shortcuts + stopword-profile scoring ------

  /** Function-word profiles (high-frequency, language-distinctive;
    * ambiguous words that collide across Romance languages are
    * avoided where possible). */
  private val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with",
      "it", "was", "this", "are", "have", "not", "they", "from", "you"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "von", "zu", "auf", "sich", "auch", "werden", "wir", "aber"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "pour", "que",
      "qui", "pas", "vous", "nous", "sur", "sont", "mais", "aux", "ce"),
    "es" -> Seq("el", "los", "es", "del", "con", "por", "las", "una",
      "para", "como", "pero", "más", "este", "esta", "ser", "hay"),
    "it" -> Seq("il", "di", "che", "della", "per", "con", "una", "sono",
      "anche", "come", "nel", "alla", "questo", "gli", "più", "dei"),
    "pt" -> Seq("o", "os", "de", "do", "da", "em", "um", "uma", "para",
      "com", "não", "mais", "como", "mas", "foi", "são", "pelo"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "niet", "aan",
      "met", "voor", "zijn", "ook", "maar", "deze", "wordt", "naar"),
    "id" -> Seq("yang", "dan", "di", "ini", "itu", "dengan", "untuk",
      "tidak", "dari", "dalam", "akan", "pada", "juga", "ke", "adalah"))

  /** Predicted language code; `und` when no profile matches. Scripts
    * with unambiguous codepoint ranges short-circuit (kana → ja before
    * the CJK-ideograph → zh check, hangul → ko, cyrillic → ru, arabic
    * → ar, greek → el, devanagari → hi); Latin-script languages score
    * by function-word membership counts. Pure expression: everything
    * runs inside whole-stage codegen, no shuffle.
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
    when(text.rlike("[\\u3040-\\u30ff]"), lit("ja"))
      .when(text.rlike("[\\uac00-\\ud7af]"), lit("ko"))
      .when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(text.rlike("[\\u0400-\\u04ff]"), lit("ru"))
      .when(text.rlike("[\\u0600-\\u06ff]"), lit("ar"))
      .when(text.rlike("[\\u0370-\\u03ff]"), lit("el"))
      .when(text.rlike("[\\u0900-\\u097f]"), lit("hi"))
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
