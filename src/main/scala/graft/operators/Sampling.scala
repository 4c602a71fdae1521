package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and source mixing for training-data
  * pipelines. Everything here is reproducible from the data alone — no
  * RNG state, no partition-order dependence — so a 100 TB pipeline
  * re-run (or an incremental top-up) selects exactly the same rows.
  *
  * The per-row key is two Lehmer steps
  * `((id * 48271 mod M) * 48271) mod M` with `M = 2^31 - 1`: one step
  * never wraps for small ids (id*48271 < M keeps the input order!),
  * but 48271^2 > M, so the second multiply wraps for every id >= 1.
  * All intermediates fit 64-bit arithmetic for ids up to ~1.9e14 (no
  * ANSI overflow), and the formula is plain integer SQL any engine
  * can reproduce for verification.
  */
object Sampling {

  private val Mod = 2147483647L // 2^31 - 1 (prime)
  private val Mul = 48271L // MINSTD multiplier

  /** The deterministic pseudo-random key of an id column. */
  def sampleKey(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(id.cast("long") * Mul, lit(Mod)) * Mul, lit(Mod))

  /** Keep ~`fraction` of rows, deterministically by id. */
  def sampleByFraction(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    df.filter(sampleKey(col(idCol)) < (fraction * Mod).toLong)
  }

  /** Deterministic train/validation/test (or any N-way) split
    * assignment: each row's split follows its id's [[sampleKey]]
    * position within [0, 1) against the cumulative weight boundaries —
    * membership is a pure function of the id, so re-runs, top-ups and
    * different engines assign identically, and a document NEVER
    * migrates between splits as the corpus grows (the leakage-safety
    * property ad-hoc `rand()` splits lack).
    *
    * @param splits ordered (label, weight); weights need not sum to 1
    *               — they are normalized. Per-row expression, zero
    *               shuffles. Rows with a NULL id deterministically land
    *               in the LAST split (every `key < bound` comparison is
    *               null, falling through the whole when-chain).
    */
  def splitAssign(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), s"bad splits $splits")
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val key = sampleKey(col(idCol))
    val expr = splits.zip(bounds).foldRight(lit(splits.last._1)) {
      case (((label, _), bound), rest) =>
        when(key < (bound * Mod).toLong, label).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Mix sources to target quotas: for each source, keep the `quota`
    * rows with the smallest sample keys (ties broken by id, so the
    * selection is total-ordered and reproducible).
    *
    * Scale shape: window partitions are SINGLE-TASK (AQE does not
    * split them), so ranking a giant source directly would funnel its
    * every row through one sort task. Instead the rank runs in two
    * exact levels: (1) a window over (source, salt) — the salt is a
    * deterministic hash of the id into `spark.sql.shuffle.partitions`
    * buckets — keeps each bucket's local top-`quota`; (2) the final
    * window over source ranks only those survivors (at most
    * `buckets * quota` rows per source). The global top-`quota` of a
    * source is contained in the union of its buckets' local
    * top-`quota`s, so the result is EXACT and identical to the
    * single-window form — and the whole thing stays one lazy plan:
    * no driver actions, no recomputation of an expensive upstream.
    */
  def mixSources(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      quota: Long): DataFrame = {
    require(quota >= 0, s"bad quota $quota")
    mixExact(df, sourceCol, idCol, lit(quota))
  }

  /** Per-source quotas (sources absent from the map are dropped). The
    * quota table broadcasts — the corpus pays only the salted source
    * shuffle. Same bounded two-level rank as the single-quota
    * overload. */
  def mixSources(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      quotas: Map[String, Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = broadcast(quotas.toSeq.toDF("__src", "__quota"))
    val joined = df.join(qdf, col(sourceCol) === col("__src"))
    mixExact(joined, sourceCol, idCol, col("__quota"))
      .drop("__src", "__quota")
  }

  /** [[mixSources]] with the `mixing.approx-above` escape hatch: when
    * the option is set and ANY quota exceeds its row threshold, the
    * whole mix flips to [[mixSourcesApprox]] (±1-2% per-source counts,
    * zero single-task stages at any quota); otherwise — and always
    * when the option is absent — the exact two-level rank runs. Opt-in
    * by design: exact selection is re-derivable row-for-row and stable
    * under corpus growth, so silently degrading it would change
    * reproducibility guarantees. */
  def mixSources(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      quotas: Map[String, Long],
      options: Map[String, String]): DataFrame = {
    val threshold = options.get("mixing.approx-above").map(_.trim.toLong)
    if (threshold.exists(t => quotas.values.exists(_ > t)))
      mixSourcesApprox(df, sourceCol, idCol, quotas)
    else mixSources(df, sourceCol, idCol, quotas)
  }

  /** Approximate-threshold source mixing for quotas where even the
    * bounded two-level rank is too much: [[mixSources]]' level-2
    * window is a single task of up to `buckets × quota` rows per
    * source — exact by contract, fine into the 10⁷ range, but a quota
    * of 10⁸+ would funnel that many rows through one sort task. This
    * variant selects by a per-source KEY CUTOFF instead: one
    * aggregation pass computes each source's row count and an
    * approx-quantile grid of the sample keys, the cutoff for
    * `quota/count` interpolates on that grid (driver work: one row
    * per source — metadata scale), and the selection is a plain
    * broadcast-joined filter. Zero windows, zero single-task stages;
    * the whole pipeline is one agg + one filter at any quota.
    *
    * Tolerance: |selected − quota| / quota is bounded by the grid
    * resolution + approx_percentile accuracy (≲1-2% in practice; the
    * spec asserts 5%). Selection stays DETERMINISTIC given the data —
    * the cutoff is a pure function of the key distribution — but
    * unlike the exact form it is not stable under corpus growth (the
    * cutoff moves with the distribution). Use exact mixing when the
    * selection must be re-derivable row-for-row; use this when the
    * quota itself is huge and ±1% is fine (typical at 100 TB).
    * Sources above the cutoff grid's top keep everything (quota >=
    * count behaves like the exact form). */
  def mixSourcesApprox(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      quotas: Map[String, Long]): DataFrame = {
    require(quotas.values.forall(_ >= 0), s"bad quotas $quotas")
    val key = sampleKey(col(idCol))
    val gridN = 1000
    val grid = (1 until gridN).map(_.toDouble / gridN)
    val stats = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"),
        percentile_approx(key, typedLit(grid), lit(10000)).as("__qs"))
      .collect() // one row per SOURCE — metadata scale
    val cutoffs: Map[String, Long] = stats.flatMap { r =>
      val src = r.get(0) match { case null => null; case x => x.toString }
      quotas.get(src).map { quota =>
        val n = r.getLong(1)
        val cut =
          if (quota >= n) Mod // keep everything
          else {
            val p = quota.toDouble / n
            val qs = r.getSeq[Long](2)
            val i = math.min(qs.length - 1, math.max(0, (p * gridN).toInt - 1))
            qs(i)
          }
        src -> cut
      }
    }.toMap
    val spark = df.sparkSession
    import spark.implicits._
    val cdf = broadcast(cutoffs.toSeq.toDF("__src", "__cut"))
    df.join(cdf, col(sourceCol) === col("__src"))
      .filter(key <= col("__cut"))
      .drop("__src", "__cut")
  }

  // --- DSIR-style importance weighting --------------------------------
  //
  // Data Selection via Importance Resampling (Xie et al., 2023): score
  // each raw document by how target-like its token distribution is,
  // then select/resample by score. The weight of a token is the ratio
  // of its smoothed document frequency in the TARGET corpus to its
  // smoothed document frequency in the RAW corpus; a document's score
  // is the sum of its distinct tokens' weights. Weights are quantized
  // to integer micro-units (floor(1e6 · ratio)) so scores are exact
  // 64-bit sums — order-independent, overflow-safe to ~9e12 tokens per
  // document, and bit-reproducible in any engine (the one double
  // division is IEEE-exact from two integer counts).

  /** Integer micro-unit importance weight per distinct token:
    * `floor(1e6 · (df_target + 1) / (df_raw + 1))` over DOCUMENT
    * frequencies (distinct-per-doc, so a token repeated inside one
    * document counts once — robust to repetition spam). One shuffle per
    * corpus (token groupBy); the target side joins by token. Returns
    * `(tok, weight)` for every raw-corpus token. */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String): DataFrame = {
    val rawToks = distinctTokens(raw, textCol).groupBy("tok")
      .agg(count(lit(1)).as("__cr"))
    val tgtToks = distinctTokens(target, textCol).groupBy("tok")
      .agg(count(lit(1)).as("__ct"))
    rawToks.join(tgtToks, Seq("tok"), "left")
      .select(col("tok"),
        floor(lit(1000000.0) * (coalesce(col("__ct"), lit(0L)) + lit(1.0)) /
          (col("__cr") + lit(1.0))).as("weight"))
  }

  /** Per-document importance score: the exact 64-bit sum of the
    * document's distinct tokens' weights (see [[importanceWeights]]).
    * The token→weight join shuffles by token hash — no skew pivot, no
    * windows — and the per-doc sum is a map-side-combinable agg.
    *
    * Documents with no tokens (empty/null text) score 0 via a sentinel
    * token that is absent from the weight table (a LEFT join +
    * coalesce), so the whole pass is ONE corpus traversal — no
    * id-distinct shuffle, no completion join. Tokens the weight table
    * has never seen (scoring a different corpus than the weights were
    * built from) likewise contribute 0. Ids are treated as document
    * identity — duplicate ids sum per id. */
  def importanceScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame): DataFrame =
    sentinelTokens(df, idCol, textCol)
      .join(weights, Seq("tok"), "left")
      .groupBy(col("__iid"))
      .agg(sum(coalesce(col("weight"), lit(0L))).as("iw_score"))
      .select(col("__iid").as(idCol), col("iw_score"))

  /** Hashed-feature DSIR — the 100 TB path. Tokens hash into
    * `numBuckets` buckets (xxhash64), so the weight table is a FIXED
    * small broadcast (default 2^16 rows) instead of a vocabulary-sized
    * shuffle join: the per-doc scoring pass touches the corpus exactly
    * once with zero shuffles on the wide side. Same integer micro-unit
    * quantization as the exact form; hash collisions blur weights the
    * way the DSIR paper's hashed n-grams do (variance bounded by
    * bucket count), so rankings agree with the exact form within
    * collision noise — spec-asserted, not oracle-gated. */
  def importanceScoresHashed(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int = 1 << 16,
      /** feature order: 1 = unigrams; 2 = the paper's unigram+bigram
        * features (word order becomes signal). Same plan shape at any
        * order — only the explode fan-out grows. */
      nGrams: Int = 1): DataFrame = {
    require(numBuckets > 0, s"bad numBuckets $numBuckets")
    require(nGrams >= 1, s"bad nGrams $nGrams")
    // sentinel tokens ('' for empty docs) get bucket -1 — outside
    // [0, numBuckets), so they miss the weight table and score 0
    // instead of inheriting a real bucket's weight
    def withBucket(toks: DataFrame) = toks.select(col("*"),
      when(col("tok") === "", lit(-1L))
        .otherwise(pmod(xxhash64(col("tok")), lit(numBuckets.toLong))).as("__b"))
    val rawB = withBucket(sentinelTokens(raw, idCol, textCol, nGrams))
    val cr = rawB.filter(col("__b") >= 0L)
      .groupBy("__b").agg(count(lit(1)).as("__cr"))
    val ct = withBucket(distinctTokens(target, textCol, nGrams = nGrams))
      .groupBy("__b").agg(count(lit(1)).as("__ct"))
    val w = broadcast(cr.join(ct, Seq("__b"), "left")
      .select(col("__b"),
        floor(lit(1000000.0) * (coalesce(col("__ct"), lit(0L)) + lit(1.0)) /
          (col("__cr") + lit(1.0))).as("weight")))
    rawB.join(w, Seq("__b"), "left")
      .groupBy(col("__iid")).agg(sum(coalesce(col("weight"), lit(0L))).as("iw_score"))
      .select(col("__iid").as(idCol), col("iw_score"))
  }

  /** Deterministic importance RESAMPLING: keep ~`fraction` of rows with
    * per-row acceptance probability proportional to `min(1, score/cap)`
    * where `cap` is the score at which acceptance saturates. The accept
    * decision compares the row's [[sampleKey]] (id-pure, engine-
    * reproducible) against `score/cap · Mod` — a pure per-row filter,
    * zero shuffles, stable under re-runs and corpus growth exactly like
    * [[sampleByFraction]]. */
  def importanceResample(
      scored: DataFrame,
      idCol: String,
      scoreCol: String,
      cap: Long): DataFrame = {
    require(cap > 0, s"bad cap $cap")
    val p = least(lit(1.0), col(scoreCol).cast("double") / cap.toDouble)
    scored.filter(sampleKey(col(idCol)) < (p * Mod).cast("long"))
  }

  /** Distinct n-gram features up to order `n`: for n=1 the lowercase
    * whitespace tokens; higher orders append space-joined adjacent
    * token windows (the DSIR paper's hashed n-gram features — bigrams
    * materially improve target matching because "new york" and "york
    * new" stop scoring identically). Pure Column expression. */
  private def gramArray(textCol: String, n: Int): org.apache.spark.sql.Column = {
    val toks = filter(
      split(trim(lower(col(textCol))), TextAnalysis.WsClass), t => t =!= "")
    val grams = (2 to n).foldLeft(toks) { (acc, k) =>
      val cnt = greatest(size(toks) - (k - 1), lit(0))
      val kg =
        if (k == 2)
          // bigrams zip the array against its own shift — empty slices
          // make short docs safe with no guard
          zip_with(slice(toks, lit(1), cnt), slice(toks, lit(k), cnt),
            (a, b) => concat_ws(" ", a, b))
        else
          // higher orders window via index; sequence(1, 0) DESCENDS in
          // Spark, so docs shorter than k need the explicit empty
          when(cnt > 0, transform(sequence(lit(1), cnt), i =>
            array_join(slice(toks, i, lit(k)), " ")))
            .otherwise(array().cast("array<string>"))
      concat(acc, kg)
    }
    array_distinct(grams)
  }

  /** Distinct lowercase whitespace tokens per row, exploded to one row
    * per (keep-cols, tok). Empty texts contribute no rows. */
  private def distinctTokens(
      df: DataFrame, textCol: String, keep: Seq[String] = Nil,
      nGrams: Int = 1): DataFrame =
    df.select(keep.map(col) :+ explode(gramArray(textCol, nGrams)).as("tok"): _*)

  /** [[distinctTokens]] keyed by `idCol` (as `__iid`), with empty/null
    * texts represented by ONE sentinel row (`tok = ""` — impossible as
    * a real token, it is filtered out) so every document survives the
    * explode and scoring stays a single corpus pass. */
  private def sentinelTokens(
      df: DataFrame, idCol: String, textCol: String,
      nGrams: Int = 1): DataFrame = {
    val toks = coalesce(gramArray(textCol, nGrams), array(lit("")))
    val withSentinel = when(size(toks) === 0, array(lit(""))).otherwise(toks)
    df.select(col(idCol).as("__iid"), explode(withSentinel).as("tok"))
  }

  private def mixExact(
      df: DataFrame, sourceCol: String, idCol: String,
      quotaCol: org.apache.spark.sql.Column): DataFrame = {
    val key = sampleKey(col(idCol))
    val buckets = df.sparkSession.sessionState.conf.numShufflePartitions
    // deterministic, id-pure salt — re-runs and different partitionings
    // bucket identically, so the selection stays reproducible
    val salt = pmod(xxhash64(col(idCol)), lit(buckets))
    val w1 = Window.partitionBy(col(sourceCol), salt).orderBy(key, col(idCol))
    val w2 = Window.partitionBy(sourceCol).orderBy(key, col(idCol))
    df.withColumn("__rk1", row_number().over(w1))
      .filter(col("__rk1") <= quotaCol)
      .withColumn("__rk", row_number().over(w2))
      .filter(col("__rk") <= quotaCol)
      .drop("__rk1", "__rk")
  }
}
