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

  /** Whitespace token-delimiter class, spelled explicitly as
    * `[\t\n\f\r ]` rather than `\s`: Java's `\s` additionally
    * matches `\x0B` (vertical tab) while RE2 — the DuckDB oracle's
    * regex engine — does not, so a `\s+` tokenizer silently diverges
    * between engines on corpora containing vertical tabs. Every
    * tokenizer here and every oracle SQL share this exact class. */
  val WsClass: String = "[\\t\\n\\f\\r ]+"

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), WsClass)

  /** Adjacent (prev, cur) token pairs of a text column. */
  private def bigramPairs(text: Column): Column = {
    val t = tokens(text)
    val n = greatest(size(t) - 1, lit(0))
    zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
      (a, b) => struct(a.as("prev"), b.as("cur")))
  }

  /** Per-document bigram negative log-likelihood — the LM-perplexity
    * quality signal of CCNet/Gopher-style filtering pipelines (public
    * recipe: score each document under a language model trained on a
    * reference corpus; surprising documents are boilerplate/noise).
    * The model here is an add-one-smoothed bigram LM trained
    * DISTRIBUTED from `reference` (bigram counts + prefix totals +
    * vocabulary size); scoring joins each document's bigrams against
    * the counts — two shuffles total, no driver-side model, so both
    * training and scoring scale with executors.
    *
    * Unseen bigrams back off to ln(1/(c(prev)+V)); unseen prefixes to
    * ln(1/V) — never-seen text scores maximally surprising instead of
    * erroring. Documents with fewer than two tokens produce no
    * bigrams and are absent from the output.
    *
    * @return (idCol, nll) — nll = −mean ln p(cur|prev); perplexity =
    *         exp(nll)
    */
  def bigramNll(
      docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      reference: org.apache.spark.sql.DataFrame, refTextCol: String)
      : org.apache.spark.sql.DataFrame = {
    val refBig = reference
      .select(explode(bigramPairs(col(refTextCol))).as("bg"))
      .select(col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    val cnt = refBig.groupBy("prev", "cur").agg(count(lit(1)).as("c"))
    val ptot = refBig.groupBy("prev").agg(count(lit(1)).as("cp"))
    val vocab = reference
      .select(explode(tokens(col(refTextCol))).as("tok"))
      .agg(countDistinct(col("tok"))).head.getLong(0).toDouble
    docs
      .select(col(idCol), explode(bigramPairs(col(textCol))).as("bg"))
      .select(col(idCol), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .join(cnt, Seq("prev", "cur"), "left")
      .join(ptot, Seq("prev"), "left")
      .select(col(idCol),
        log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (coalesce(col("cp"), lit(0L)) + lit(vocab))).as("lp"))
      .groupBy(idCol)
      .agg((-avg(col("lp"))).as("nll"))
  }

  /** FastText-style linear quality-classifier INFERENCE (the scoring
    * half of the standard web-data quality filter, e.g. the CCNet /
    * GPT-3 "looks like reference text" classifiers): hashed
    * bag-of-words features with mean pooling —
    * score = sigmoid(bias + mean over tokens of weight[bucket(tok)]).
    *
    * The feature hash is md5-based and ENGINE-PORTABLE (bucket =
    * last-8-hex-chars of md5(token) mod dims), so any engine — or the
    * DuckDB oracle — reproduces the features bit-exactly; training
    * happens upstream, weights arrive as a (bucket, weight) table.
    *
    * Scale: tokens explode per-row (codegen), the weight table
    * broadcasts (dims rows, never corpus-sized), one hash-aggregate
    * per doc — map-side combine absorbs the explode. */
  def linearClassifierScore(
      docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      weights: org.apache.spark.sql.DataFrame, // (bucket: long, weight: double)
      dims: Int, bias: Double): org.apache.spark.sql.DataFrame = {
    require(dims > 0, "dims must be positive")
    val bucket = pmod(
      conv(substring(md5(col("tok")), 25, 8), 16, 10).cast("long"), lit(dims))
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("bucket", bucket)
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg((lit(bias) +
        sum(coalesce(col("weight"), lit(0.0))) / count(lit(1))).as("z"))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("score"))
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** GPT-2-style pre-tokenizer pattern, restricted to RE2-safe syntax
    * (no lookahead — the trailing-space special case degrades to plain
    * whitespace runs) so an independent engine can mirror the count
    * exactly. Whitespace is the EXPLICIT class `[\t\n\f\r ]` — Java's
    * `\s` includes vertical tab (\x0B) while RE2's does not, so `\s`
    * would diverge on texts containing one. Groups: contractions,
    * space-glued letter runs, digit runs, punctuation runs,
    * whitespace runs. */
  val BpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\t\\n\\f\\r \\p{L}\\p{N}]+|[\\t\\n\\f\\r ]+"

  /** Pre-tokenizer token count — the usual proxy for BPE token counts
    * in corpus budgeting (true BPE merges only ever SPLIT these
    * pieces further per vocab; the pre-token count is the stable,
    * vocab-independent lower bound). Codegen'd regexp, zero shuffles. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")

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
    length(regexp_replace(trim(text), WsClass, "")).cast("double") /
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

  /** The Gopher "required words" (Rae et al. 2021, A1.1 rule 7): a
    * document must contain at least 2 of these to pass. */
  val GopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-rule bundle (Rae et al. 2021, appendix A1.1) as a
    * struct of per-rule booleans plus the composed `keep` — the
    * standard pre-training document filter, evaluated as ONE codegen'd
    * projection (zero shuffles, zero UDFs):
    *
    *  - ok_words:    50 <= word count <= 100,000
    *  - ok_mean_len: 3 <= mean word length <= 10
    *  - ok_symbol:   (# + ellipsis occurrences) / words < 0.1
    *  - ok_bullets:  < 90% of lines start with a bullet
    *  - ok_ellipsis: < 30% of lines end with an ellipsis
    *  - ok_alpha:    >= 80% of words contain an alphabetic char
    *  - ok_stops:    >= 2 distinct [[GopherRequiredWords]] present
    *
    * Every sub-expression is integer counting + one IEEE division, so
    * an independent engine reproduces each flag bit-exactly. Word
    * stats run over the lowercased whitespace tokens; line stats over
    * the raw newline split. */
  def gopherQualityFlags(
      textIn: Column,
      minWords: Long = 50L,
      maxWords: Long = 100000L): Column = {
    // null text = empty document (fails word-count/stops like any
    // other too-short doc) rather than a struct of NULL booleans a
    // downstream `WHERE keep` would silently drop in a surprising way
    val text = coalesce(textIn, lit(""))
    val words = filter(tokens(text), t => t =!= "")
    val nWords = size(words).cast("long")
    val wordsDen = greatest(nWords, lit(1L)).cast("double")
    val meanLen =
      aggregate(words, lit(0L), (acc, w) => acc + length(w).cast("long"))
        .cast("double") / wordsDen
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)
    val symbolRatio = (hashes + ellipses).cast("double") / wordsDen
    val lines = split(text, "\n")
    val linesDen = greatest(size(lines), lit(1)).cast("double")
    val bulletFrac = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
      .cast("double") / linesDen
    val ellipsisFrac = size(filter(lines, l => l.endsWith("...")))
      .cast("double") / linesDen
    val alphaFrac = size(filter(words, w => w.rlike("[a-z]")))
      .cast("double") / wordsDen
    val stops = size(array_intersect(
      array_distinct(words), array(GopherRequiredWords.map(lit): _*)))
    val okWords = nWords >= minWords && nWords <= maxWords
    val okMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val okSymbol = symbolRatio < 0.1
    val okBullets = bulletFrac < 0.9
    val okEllipsis = ellipsisFrac < 0.3
    val okAlpha = alphaFrac >= 0.8
    val okStops = stops >= 2
    struct(
      okWords.as("ok_words"), okMeanLen.as("ok_mean_len"),
      okSymbol.as("ok_symbol"), okBullets.as("ok_bullets"),
      okEllipsis.as("ok_ellipsis"), okAlpha.as("ok_alpha"),
      okStops.as("ok_stops"),
      (okWords && okMeanLen && okSymbol && okBullets &&
        okEllipsis && okAlpha && okStops).as("keep"))
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

  /** Deterministic marker text per detectable language (+ "und"),
    * sorted by code. Latin-script languages use their full function-
    * word profile — the profile scores strictly higher against itself
    * than any other profile's overlap can, so argmax is deterministic;
    * script-range languages use a single-script sample; "und" matches
    * nothing. Lets a gate plant markers whose expected label is
    * computable in plain SQL, turning langId from rows-only into an
    * oracle-exact check across every branch of the classifier. */
  lazy val langMarkers: Seq[(String, String)] =
    (LangProfiles.toSeq.map { case (c, ws) => c -> ws.mkString(" ") } ++ Seq(
      "ja" -> "こんにちは 世界 です",
      "ko" -> "안녕하세요 세계 입니다",
      "zh" -> "你好 世界 中文",
      "ru" -> "привет мир это",
      "ar" -> "مرحبا بالعالم هذا",
      "el" -> "γεια σου κόσμε αυτό",
      "hi" -> "नमस्ते दुनिया यह",
      "und" -> "zzqq xxyy qqzz wwvv")).sortBy(_._1)

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

  // --- PII ------------------------------------------------------------

  /** Conventional PII patterns (kept RE2-compatible so an external
    * engine can reproduce the redaction byte-for-byte). Order matters —
    * redaction applies them in sequence; IPv4 runs before phone so
    * dotted quads are never half-eaten by the phone pattern. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b")

  /** Per-type PII hit count (codegen'd regexp scan, zero shuffle). */
  def piiCount(text: Column, kind: String): Column =
    size(regexp_extract_all(text,
      lit(piiPatterns.toMap.apply(kind)), lit(0))).cast("long")

  /** Redact all PII patterns to `[TYPE]` placeholder tokens. A 100 TB
    * redaction pass is one narrow projection — no shuffle, no UDF. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (kind, pat)) =>
      regexp_replace(c, pat, s"[${kind.toUpperCase}]")
    }

  // --- repetition / boilerplate --------------------------------------

  /** Fraction of duplicate lines in a document (0 = all unique) —
    * the Gopher-style repetition signal for boilerplate removal. */
  def dupLineRatio(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val n = size(lines)
    when(n <= 0, lit(0.0)).otherwise(
      (n - size(array_distinct(lines))).cast("double") / n.cast("double"))
  }

  /** CROSS-document boilerplate removal (CCNet / RefinedWeb line-level
    * dedup): drop every line that occurs in MORE than `maxDocFreq`
    * distinct documents (navigation, cookie banners, footers), then
    * reassemble each document from its surviving lines in original
    * order. Documents whose every line was boilerplate are dropped.
    *
    * Scale shape: explode → per-line distinct-doc count (two-phase
    * hash agg) → shuffle join on the line value → per-doc reassembly
    * via `array_sort(collect_list(struct(pos, line)))`. No windows, no
    * driver-side state; the join key is the line itself so the result
    * is EXACT (a production 100 TB run can pre-bucket on xxhash64(line)
    * — same result, the hash only co-locates). Line order inside a
    * document is restored by position, never by arrival. */
  def removeFrequentLines(
      df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      maxDocFreq: Long, sep: String = "\n")
      : org.apache.spark.sql.DataFrame = {
    require(maxDocFreq >= 1, s"bad maxDocFreq $maxDocFreq")
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__line")))
    val freq = lines.groupBy("__line")
      .agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDocFreq)
    // anti join: only boilerplate lines are materialized on the build
    // side — usually a tiny fraction of the corpus
    lines.join(freq, Seq("__line"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__line"))))
        .as("__parts"))
      .select(col(idCol),
        concat_ws(sep, transform(col("__parts"), p => p("__line")))
          .as(textCol))
  }

  /** [[removeFrequentLines]] with xxhash64(line) pre-bucketing — the
    * 100 TB shape: the corpus-wide frequency shuffle carries only
    * (hash, id) pairs, never raw line text (at web scale the lines ARE
    * the corpus, and shuffling them as group keys writes the whole
    * input to shuffle disk). Collision-safe and EXACTLY equivalent to
    * the exact form:
    *
    *  1. count distinct docs per line HASH (8-byte shuffle key);
    *  2. hashes over the threshold are candidates — a tiny set, but a
    *     collision could lump distinct lines and over-count, so the
    *     candidate rows (only!) are re-counted per (hash, line TEXT)
    *     exactly — the one stage that shuffles any text is bounded by
    *     candidate volume;
    *  3. the verified boilerplate line set broadcasts into the same
    *     LeftAnti + positional reassembly as the exact form.
    */
  def removeFrequentLinesHashed(
      df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      maxDocFreq: Long, sep: String = "\n")
      : org.apache.spark.sql.DataFrame = {
    require(maxDocFreq >= 1, s"bad maxDocFreq $maxDocFreq")
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__line")))
      .withColumn("__h", xxhash64(col("__line")))
    val candHashes = lines.groupBy("__h")
      .agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDocFreq)
      .select("__h")
    // collision-safe verify: exact per-(hash, text) doc frequency, but
    // only over rows whose hash is a candidate
    val boilerplate = lines
      .join(broadcast(candHashes), Seq("__h"))
      .groupBy(col("__h"), col("__line"))
      .agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDocFreq)
      .select("__h", "__line")
    lines.join(broadcast(boilerplate), Seq("__h", "__line"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__line"))))
        .as("__parts"))
      .select(col(idCol),
        concat_ws(sep, transform(col("__parts"), p => p("__line")))
          .as(textCol))
  }

  /** Fraction of duplicate word w-grams (captures within-line loops
    * that line-level dedup misses). */
  def dupNgramRatio(text: Column, w: Int = 3): Column = {
    val grams = shingles(text, w)
    val n = size(grams)
    when(n <= 0, lit(0.0)).otherwise(
      (n - size(array_distinct(grams))).cast("double") / n.cast("double"))
  }

  // --- sequence packing ----------------------------------------------

  /** Token-level sequence packing (the standard pretraining layout):
    * documents are concatenated in `orderCol` order and sliced into
    * fixed `windowTokens` chunks, so a document spans packs
    * [floor(prevCumSum / C), floor((prevCumSum + len - 1) / C)].
    * Returns (orderCol, n_tokens, first_pack, last_pack).
    *
    * NOT a `Window.orderBy` cum-sum — an unpartitioned window funnels
    * the whole corpus through one task. Instead the classic two-phase
    * prefix sum: range-partition by `orderCol`, per-partition token
    * totals (one tiny collect, bounded by the partition count) become
    * start offsets, then a per-partition running sum adds them — every
    * stage is distributed, and tokenization stays codegen'd in the
    * projection before the shuffle. */
  def packSequences(
      df: org.apache.spark.sql.DataFrame,
      orderCol: String,
      textCol: String,
      windowTokens: Long,
      partitions: Int = 0): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    // the OUTPUT is keyed by the order column cast to long, so only
    // integral keys round-trip (a fractional key would truncate and
    // make output rows ambiguous) — reject up front, not inside a task
    val ordType = df.schema(orderCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
      .contains(ordType),
      s"packSequences needs an integral order column; $orderCol is $ordType")
    val nPart = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val toks = df
      .select(col(orderCol).as("__ord"), tokenCount(col(textCol)).as("n_tokens"))
      .repartitionByRange(nPart, col("__ord"))
      .sortWithinPartitions("__ord")
      // pinned so phase 1's partition layout is EXACTLY phase 2's;
      // Spark's ContextCleaner reclaims the cache once the returned
      // plan is garbage-collected
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 1: per-partition token totals -> exclusive prefix offsets,
    // keyed by SPLIT INDEX. Phase 2 reads the index through the RDD's
    // mapPartitionsWithIndex, which is the PARENT's split id even when
    // a downstream coalesce() fuses partitions into one task (where
    // TaskContext.getPartitionId would read 0 for all of them). Keying
    // by the partition's first ORDER KEY instead is unsound: duplicate
    // keys straddling a range boundary — or distinct fractional keys
    // truncating to one long — give two partitions the same first key
    // and the later one silently inherits the earlier one's offset.
    val perPart = toks.groupBy(spark_partition_id().as("pid"))
      .agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1) // ascending pid == ascending key range
    val bounds = scala.collection.mutable.Map.empty[Int, Long]
    var acc = 0L
    perPart.foreach { case (pid, t) =>
      bounds(pid) = acc
      acc += t
    }
    val bcast = spark.sparkContext.broadcast(bounds.toMap)
    // phase 2: running sum per partition, started at the split's offset
    import spark.implicits._
    val packed = toks.select(col("__ord").cast("long"), col("n_tokens"))
      .as[(Long, Long)].rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          var cum = bcast.value.getOrElse(pid,
            throw new IllegalStateException(
              s"no pack offset recorded for partition $pid"))
          it.map { case (ord, n) =>
            val before = cum
            cum += n
            (ord, n, before / windowTokens,
              (before + math.max(n, 1L) - 1L) / windowTokens)
          }
        }
      }
    spark.createDataset(packed)
      .toDF(orderCol, "n_tokens", "first_pack", "last_pack")
  }
}
