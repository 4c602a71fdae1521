package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.
  *
  * Scale design (100 TB):
  *  - signatures are per-row expressions (no shuffle, full codegen);
  *  - candidate generation is band/chunk-bucket equi-joins — the only
  *    shuffles, keyed so Spark's hash partitioning spreads buckets;
  *  - oversized buckets (degenerate content, e.g. empty docs) collapse
  *    content-identical rows to star edges + one representative before
  *    the pair join (recall-preserving), with `maxBucketSize` bounding
  *    the representatives so a hot bucket cannot create a quadratic
  *    straggler;
  *  - verification runs only on candidate pairs.
  */
object Dedup {

  // --- exact ----------------------------------------------------------

  /** Exact dedup: one canonical (min-id) row per distinct key column.
    * Hash-groupBy; map-side partial aggregation makes this one shuffle
    * of distinct keys, not rows.
    */
  def exact(df: DataFrame, idCol: String, keyCol: Column): DataFrame =
    df.groupBy(keyCol.as("dup_key"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  // --- MinHash + LSH --------------------------------------------------

  /** Prime modulus for the (a*h+b) mod p permutation family. 2^31-1
    * keeps a*h+b under 2^62, inside Long even with ANSI overflow
    * checks (Spark 4 default). */
  private val P = 2147483647L // 2^31 - 1 (Mersenne)

  /** Deterministic permutation constants derived from the index via
    * splitmix64-style mixing (public-domain construction), so
    * signatures are stable across runs with no RNG state. */
  private def mix(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** k-value MinHash signature over word-shingle hashes.
    * Entirely expression-based: `transform` + `array_min` per
    * permutation, evaluated once per row inside codegen.
    */
  def minhashSignature(text: Column, k: Int = 32, shingleWidth: Int = 3): Column = {
    val hashes = transform(TextAnalysis.shingles(text, shingleWidth), s => xxhash64(s))
    val sig = (0 until k).map { i =>
      val a = math.abs(mix(2L * i)) % (P - 1) + 1 // a in [1, P-1]
      val b = math.abs(mix(2L * i + 1)) % P
      array_min(transform(hashes, h => pmod(pmod(h, lit(P)) * a + b, lit(P))))
    }
    array(sig: _*)
  }

  /** Driver-side mirror of Catalyst's `xxhash64(string)` (seed 42 over
    * the UTF-8 bytes) — lets compiled per-row loops hash exactly what
    * the expression form hashed, so signatures are bit-identical
    * across both forms. */
  private def xx64(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, 42L)

  /** MinHash signatures computed the 100 TB way (r17 shape): ONE
    * compiled per-row loop over the token array — shingle strings,
    * xxhash64 and all k permutation minima in a single pass, with NO
    * shuffle at all (a signature is a function of its own row). This
    * replaced the explode + k-column hash-aggregate form: the explode
    * paid a corpus-wide Exchange and the k min-columns built a plan
    * tree whose analysis/codegen dominated gate wall time; the values
    * are bit-identical (same shingles, same xxhash64, same
    * (a·h+b) mod P arithmetic — spec-pinned in OperatorsSpec). The
    * UDF is the documented exception for tight numeric inner loops
    * (see cosineUdf).
    *
    * PRECONDITION: ids must be unique. One signature row is emitted
    * per input row; the pre-r17 explode+groupBy(id) form would instead
    * have collapsed duplicate ids into one combined signature over the
    * union of their shingles — with duplicate-id input the two forms
    * produce different downstream LSH pair sets. */
  def minhashSignatureTable(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, shingleWidth: Int = 3): DataFrame = {
    val ab = (0 until k).map { i =>
      (math.abs(mix(2L * i)) % (P - 1) + 1, math.abs(mix(2L * i + 1)) % P)
    }.toArray
    val w = shingleWidth
    val sigUdf = udf { (toks: Seq[String]) =>
      // toks is never null here (null text filtered below — the old
      // explode dropped those rows the same way)
      val n = toks.length
      val t = toks.toArray
      val mins = Array.fill(k)(Long.MaxValue)
      val shCount = if (n < w) 1 else n - w + 1
      var i = 0
      while (i < shCount) {
        val sb = new java.lang.StringBuilder
        val end = if (n < w) n else i + w
        var j = i
        while (j < end) {
          if (j > i) sb.append(' ')
          sb.append(t(j))
          j += 1
        }
        val h = java.lang.Math.floorMod(xx64(sb.toString), P)
        var q = 0
        while (q < k) {
          val v = java.lang.Math.floorMod(h * ab(q)._1 + ab(q)._2, P)
          if (v < mins(q)) mins(q) = v
          q += 1
        }
        i += 1
      }
      mins
    }
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        sigUdf(TextAnalysis.tokens(col(textCol))).as("sig"))
  }

  /** LSH candidate pairs from MinHash signatures.
    *
    * @return (id_a, id_b) with id_a < id_b, distinct, where the two
    *         docs agree on at least one of `bands` signature bands.
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 32,
      bands: Int = 8,
      maxBucketSize: Int = 1000): DataFrame = {
    val rows = k / bands
    val sig = minhashSignatureTable(df, idCol, textCol, k)
    val banded = sig.select(col("id"), xxhash64(col("sig")).as("__sigh"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bh"))
      }: _*)).as("bb"))
      .select(col("id"), col("__sigh"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))
    bucketJoinPairs(banded, Seq("band", "bh"), maxBucketSize,
      fineKey = col("__sigh"))
  }

  /** Full MinHash LSH dedup: candidates verified with exact token-set
    * Jaccard; returns pairs with jaccard >= threshold. */
  def minhashDedupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      k: Int = 32,
      bands: Int = 8): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, k, bands)
    verifyJaccard(cands, df, idCol, tokenSet(col(textCol)), threshold)
  }

  // --- SimHash --------------------------------------------------------

  /** 64-bit SimHash over token hashes: bit j of the result is 1 iff the
    * sum over tokens of ±1 (sign of bit j of the token hash) is
    * positive. Implemented as 64 `aggregate` folds over the token-hash
    * array — per-row, no shuffle. */
  def simhash(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash per doc, computed scale-first (r17 shape): ONE compiled
    * per-row loop over the token array — xxhash64 each token and fold
    * the 64 bit votes in a single pass, NO shuffle at all (a simhash
    * is a function of its own row). This replaced the explode +
    * 64-column hash-aggregate form, whose plan-tree analysis/codegen
    * dominated gate wall time and which paid a corpus-wide Exchange
    * the computation never needed. Values are bit-identical (same
    * xxhash64, same ±1 integer votes, same `votes > 0` tie rule).
    *
    * PRECONDITION: ids must be unique — one row per input row; see
    * [[minhashSignatureTable]] for the duplicate-id caveat. */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val shUdf = udf { (toks: Seq[String]) =>
      val votes = new Array[Long](64)
      toks.foreach { t =>
        val h = xx64(t)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      var sh = 0L
      var j = 0
      while (j < 64) { if (votes(j) > 0) sh |= (1L << j); j += 1 }
      sh
    }
    // null text filtered exactly as the old explode dropped those rows
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        shUdf(TextAnalysis.tokens(col(textCol))).as("sh"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    *
    * Blocking with a recall GUARANTEE: the 64-bit hash is cut into
    * `maxHamming + 1` chunks — a pair differing in at most maxHamming
    * bits cannot differ in every chunk (pigeonhole), so it always
    * shares at least one (chunk, value) bucket. Chunk count is derived
    * from maxHamming rather than fixed, because 4 fixed chunks only
    * guarantee recall up to Hamming 3. Note the trade-off: large
    * maxHamming means narrow chunks → hot buckets; those collapse
    * content-identical rows to star edges (no recall loss) and bound
    * the remaining DISTINCT-content join at `maxBucketSize`
    * representatives (overflow WARN-counted — prefer maxHamming <= 7
    * at scale).
    */
  def simhashDedupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    simhashPairs(simhashTable(df, idCol, textCol), maxHamming, maxBucketSize)

  /** Near-dup pairs from a precomputed (id, sh) SimHash table — the
    * blocking+verify half of [[simhashDedupPairs]], separated so the
    * pigeonhole recall guarantee is testable on planted hash values. */
  def simhashPairs(
      sh: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 63]")
    val nChunks = math.min(maxHamming + 1, 64)
    val chunkDefs = (0 until nChunks).map { c =>
      val start = c * 64 / nChunks
      val width = (c + 1) * 64 / nChunks - start
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(c).as("chunk"),
        shiftright(col("sh"), start).bitwiseAND(mask).as("cv"))
    }
    val chunked =
      sh.select(col("id"), col("sh"), explode(array(chunkDefs: _*)).as("cc"))
        .select(col("id"), col("sh"), col("cc.chunk").as("chunk"), col("cc.cv").as("cv"))
    // Secondary keys for over-cap buckets, pigeonhole-complete one
    // level down: for a hot chunk c, the 64-w REMAINING bit positions
    // split into maxHamming+1 masked groups — a pair within the
    // Hamming budget agrees on chunk c and differs in ≤ maxHamming
    // remaining bits, so it must agree on ≥1 masked group (same proof
    // as the top-level chunking). Masks are per-(c, group) literals;
    // the sub-value is the hash ANDed with the group's mask.
    val subMasks: Int => Seq[Long] = { c =>
      val start = c * 64 / nChunks
      val end = (c + 1) * 64 / nChunks
      val remaining = (0 until 64).filterNot(b => b >= start && b < end)
      val g = remaining.size.toDouble / nChunks
      (0 until nChunks).map { s =>
        remaining.slice(math.round(s * g).toInt, math.round((s + 1) * g).toInt)
          .foldLeft(0L)((m, b) => m | (1L << b))
      }
    }
    val subArr = (0 until nChunks).foldLeft(lit(null).cast("array<bigint>")) {
      case (acc, c) =>
        when(col("chunk") === c,
          array(subMasks(c).map(m => col("sh").bitwiseAND(lit(m))): _*))
          .otherwise(acc)
    }
    // hot chunk buckets collapse by the full 64-bit hash (exact, not a
    // proxy): identical-sh groups become stars (hamming 0), distinct
    // sh values pair via representatives — re-bucketed by the
    // remaining-bit sub-chunks when even the representatives overflow
    bucketJoinPairs(chunked, Seq("chunk", "cv"), maxBucketSize,
      fineKey = col("sh"), payload = Seq("sh"), subKeys = Some(subArr))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // --- n-gram Jaccard -------------------------------------------------

  /** Distinct lowercase character n-grams. */
  def charNgrams(text: Column, n: Int = 3): Column = {
    val t = lower(trim(text))
    array_distinct(
      when(length(t) < n, array(t))
        .otherwise(transform(
          sequence(lit(1), length(t) - (n - 1)),
          i => t.substr(i, lit(n)))))
  }

  /** Distinct token set (for word-level Jaccard). */
  def tokenSet(text: Column): Column = array_distinct(TextAnalysis.tokens(text))

  /** Exact Jaccard similarity of two array columns (treated as sets). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** n-gram-Jaccard near-dup pairs. Candidate generation reuses the
    * MinHash LSH bands (computed over word shingles) — at scale an
    * all-pairs n-gram comparison is quadratic, so LSH prefilters. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      k: Int = 32,
      bands: Int = 16): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, k, bands)
    verifyJaccard(cands, df, idCol, charNgrams(col(textCol), n), threshold)
  }

  // --- embedding-cosine near-dup --------------------------------------

  /** Candidate pairs for embedding near-dup: rows sharing a random-
    * hyperplane LSH bucket ([[Similarity.lshBuckets]]) in at least one
    * table. The only shuffle is the (table, bucket) equi-join — near-
    * duplicate vectors (small angle) collide with probability
    * 1-(1-(1-θ/π)^planes)^tables, everything else spreads across
    * 2^planes buckets per table. MANY planes (narrow buckets) suit
    * near-dup detection, unlike ANN search (s02) which wants wide
    * buckets for recall of moderately-similar neighbors. */
  def cosineCandidates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      tables: Int = 10,
      planesPerTable: Int = 10,
      seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"),
      xxhash64(col(vecCol)).as("__vh"),
      posexplode(Similarity.lshBuckets(col(vecCol), dim, tables, planesPerTable, seed))
        .as(Seq("tbl", "bucket")))
    bucketJoinPairs(bucketed, Seq("tbl", "bucket"), maxBucketSize,
      fineKey = col("__vh"))
  }

  /** Embedding-cosine near-dup pairs: LSH candidates verified by exact
    * cosine. The threshold compares the ROUNDED cosine so the same
    * boundary decision is reproducible in an external oracle engine
    * computing the identical formula. */
  def cosineDedupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.9,
      tables: Int = 10,
      planesPerTable: Int = 10,
      seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    val cands = cosineCandidates(df, idCol, vecCol, dim, tables, planesPerTable, seed, maxBucketSize)
    verifyCosine(cands, df, idCol, vecCol, threshold)
  }

  /** Exhaustive cosine pairs within a blocking column — quadratic
    * within blocks BY DESIGN: this is the oracle-checkable companion
    * to [[cosineDedupPairs]] (same role p07 plays for p05). */
  def cosinePairsBlocked(
      df: DataFrame,
      idCol: String,
      blockCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val a = v.select(col("blk"), col("id").as("id_a"), col("v").as("va"))
    val b = v.select(col("blk"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineUdf(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Compiled one-pass cosine — the documented UDF exception for tight
    * numeric inner loops (see Similarity.unitNorm): a JIT'd loop beats
    * the interpreted zip_with/aggregate lambda tree by ~2 orders of
    * magnitude, which dominates when verifying 1e5-1e6 pairs. Division
    * and summation order match the expression form and the oracle
    * (dot and each squared norm are independent left-to-right folds). */
  private val cosineUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
    // mismatched lengths are malformed embeddings — surface them as
    // NULL (filtered out downstream) rather than silently scoring the
    // common prefix, which could report spurious near-duplicates
    if (a.length != b.length) Option.empty[Double]
    else {
      val x = a.toArray; val y = b.toArray
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      val n = x.length
      while (i < n) { d += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1 }
      Some(d / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  /** Join candidate pairs back to vectors and keep pairs with rounded
    * exact cosine >= threshold. */
  private def verifyCosine(
      cands: DataFrame,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val vecs = df.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("vv"))
    cands
      .join(vecs.withColumnRenamed("vid", "id_a").withColumnRenamed("vv", "va"), "id_a")
      .join(vecs.withColumnRenamed("vid", "id_b").withColumnRenamed("vv", "vb"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(cosineUdf(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // --- shared helpers -------------------------------------------------

  /** Prefix of the accumulator names the skew guards register. */
  val SkewMetricPrefix = "graft.dedup.skew"

  private val skewSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Last-write-wins keyed counts: each key identifies ONE bucket (or
    * sub-bucket) and its value is a DETERMINISTIC function of that
    * bucket's data, recorded once per bucket from its rank-1 row. A
    * duplicate add — the same subplan evaluated by a second join
    * branch, or a retried task — overwrites the key with the SAME
    * value instead of double-counting, so the derived totals are
    * EXACT (the r11/r12 accumulator pairs over-counted 2-4× under
    * multi-branch evaluation). Accumulators — not Dataset.observe —
    * because AQE's empty-relation propagation can erase a
    * CollectMetrics node from the executed plan when the guard drops
    * EVERYTHING (the exact case that must not go silent). */
  private class KeyedCountAcc
      extends org.apache.spark.util.AccumulatorV2[(String, Long), Map[String, Long]] {
    private val m = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    override def isZero: Boolean = m.isEmpty
    override def copy(): KeyedCountAcc = {
      val c = new KeyedCountAcc; c.m.putAll(m); c
    }
    override def reset(): Unit = m.clear()
    override def add(v: (String, Long)): Unit = m.put(v._1, v._2)
    override def merge(
        other: org.apache.spark.util.AccumulatorV2[(String, Long), Map[String, Long]]): Unit =
      other match {
        case o: KeyedCountAcc => m.putAll(o.m)
        case _ => ()
      }
    override def value: Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      m.forEach((k, v) => b += k -> v.longValue)
      b.result()
    }
  }

  /** Per-guard-site drop accumulators, keyed
    * `graft.dedup.skew.<site>.<n>` — one [[KeyedCountAcc]] entry per
    * bucket with its exact dropped-representative count. */
  private val skewAccs =
    scala.collection.concurrent.TrieMap.empty[String, KeyedCountAcc]

  /** Snapshot of skew-guard drops, keyed by guard name:
    * (dropped_rows, dropped_buckets) — the no-silent-caps window for
    * callers and tests. Synchronously current after any action that
    * executed a guarded join; EXACT under multi-branch evaluation and
    * task retries (per-bucket last-write-wins, see [[KeyedCountAcc]]),
    * so `maxBucketSize` can be sized from the magnitudes. */
  def skewDrops: Map[String, (Long, Long)] =
    skewAccs.iterator.map { case (name, acc) =>
      val v = acc.value
      name -> (v.values.sum, v.count(_._2 > 0L).toLong)
    }.toMap

  /** For tests: forget prior guards' accumulators. */
  def skewDropsReset(): Unit = { skewAccs.clear(); collapseAccs.clear() }

  /** Prefix of the accumulator names the hot-bucket COLLAPSE paths
    * register (recall-preserving, unlike [[skewDrops]]' real drops). */
  val CollapseMetricPrefix = "graft.dedup.collapse"

  private val collapseAccs =
    scala.collection.concurrent.TrieMap.empty[String, KeyedCountAcc]

  /** Snapshot of hot-bucket collapses, keyed by site:
    * (member rows collapsed into star edges, hot buckets). Informational
    * — no recall is lost on these rows, their pairs are represented by
    * star + representative edges. Exact, same mechanism as
    * [[skewDrops]]. */
  def collapseStats: Map[String, (Long, Long)] =
    collapseAccs.iterator.map { case (name, acc) =>
      val v = acc.value
      // entries are keyed per bucket (collapseHotBuckets) or per
      // (bucket \u0002 fineKey) group (bucketJoinPairs) — the bucket
      // count is the distinct prefix count either way
      name -> (v.values.sum,
        v.keysIterator.map(_.takeWhile(_ != '\u0002')).toSet.size.toLong)
    }.toMap

  private val skewLogged = scala.collection.concurrent.TrieMap.empty[String, Long]
  private val collapseLogged = scala.collection.concurrent.TrieMap.empty[String, Long]

  private val listenerRegistered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.sql.classic.SparkSession, java.lang.Boolean])

  /** Register-once listener: WARN when a guard's drop count grows, so
    * a silent cap at 100 TB cannot read as "deduped" for exactly the
    * degenerate content (empty/boilerplate docs) that concentrates in
    * hot buckets. */
  private def registerSkewListener(df: DataFrame): Unit = {
    listenerRegistered.synchronized {
      val s = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      if (!listenerRegistered.contains(s)) {
        listenerRegistered.add(s)
        s.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
          private val log = org.slf4j.LoggerFactory.getLogger("graft.Dedup")
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
            skewDrops.foreach { case (name, (rows, buckets)) =>
              if (rows > 0 && skewLogged.getOrElse(name, 0L) < rows) {
                skewLogged.put(name, rows)
                log.warn(s"$name: skew guard dropped $rows DISTINCT-content " +
                  s"representatives in ~$buckets oversized buckets — near-dup " +
                  "recall is lost for them; raise maxBucketSize or pre-filter " +
                  "degenerate content")
              }
            }
            collapseStats.foreach { case (name, (rows, buckets)) =>
              if (rows > 0 && collapseLogged.getOrElse(name, 0L) < rows) {
                collapseLogged.put(name, rows)
                log.info(s"$name: $rows content-identical rows in ~$buckets hot " +
                  "buckets collapsed to star edges (connectivity-preserving, " +
                  "no recall loss)")
              }
            }
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
        })
      }
    }
  }

  /** Collapse a banded frame's over-cap buckets to one representative
    * per identical-content group (by `fineKey`), rank-capped per
    * bucket — the PROBE-side half of [[bucketJoinPairs]]' guard, for
    * paths that join against a persisted index instead of self-joining.
    * Connectivity with the collapsed members comes from the caller's
    * within-batch star pairs (same banding, same fineKey → same
    * groups). Collapses are INFO-counted; only representative overflow
    * drops, WARN-counted. */
  /** One guard site's accumulators: dropAcc (real recall loss, WARN)
    * and collAcc (recall-preserving collapses, INFO), registered under
    * a fresh per-call name. */
  private def guardAccumulators(
      df: DataFrame, site: String): (KeyedCountAcc, KeyedCountAcc) = {
    registerSkewListener(df)
    if (skewAccs.size > 256) { skewAccs.clear(); skewLogged.clear() }
    if (collapseAccs.size > 256) { collapseAccs.clear(); collapseLogged.clear() }
    val n = skewSeq.incrementAndGet()
    val dropName = s"$SkewMetricPrefix.$site.$n"
    val collName = s"$CollapseMetricPrefix.$site.$n"
    val sc = df.sparkSession.sparkContext
    val dropAcc = new KeyedCountAcc
    sc.register(dropAcc, dropName)
    skewAccs.put(dropName, dropAcc)
    val collAcc = new KeyedCountAcc
    sc.register(collAcc, collName)
    collapseAccs.put(collName, collAcc)
    (dropAcc, collAcc)
  }

  /** Materialize a banded/chunked frame ONCE before multi-branch
    * consumption (r18, guide §3.3 "materialising an intermediate
    * truncates the plan" + §4.4 duplicated-UDF warning): the guarded
    * joins below reference their input from 4-6 branches (over-cap
    * aggregation, anti/semi splits, the pair join's two sides), and a
    * per-row signature frame has NO exchange the branches could reuse —
    * each branch re-ran the scan + signature UDF (3× at gate scale, 3
    * corpus scans at 100 TB). An eager localCheckpoint computes the
    * frame exactly once and every branch reads the materialized rows;
    * blocks are scoped to the query and reclaimed by the context
    * cleaner (same pattern as CdcFormats.inferParse). Values are
    * unchanged — checkpointing only stores the computed rows. A frame
    * that IS already a checkpoint (callers sharing one frame across
    * several guarded calls pre-materialize) is passed through. */
  private def materializeOnce(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case _: org.apache.spark.sql.execution.LogicalRDD => df
      case _ => df.localCheckpoint(eager = true)
    }

  /** A bucket's identity string for the keyed accumulators: a 64-bit
    * hash, NOT a concat — concat_ws silently skips NULLs, so distinct
    * buckets like (null,'x') and ('x',null) would collide onto one
    * accumulator key and last-write-wins would undercount. Spark's
    * hash expressions ALSO skip null children (a null leaves the
    * running seed untouched), so a bare xxhash64(keys) has the same
    * collision for same-typed keys; each key is therefore anchored by
    * a never-null isnull flag hashed alongside the value — (null, v)
    * chains Int(1),Int(0),v while (v, null) chains Int(0),v,Int(1),
    * distinct positions, distinct hashes. */
  private def bucketKeyCol(keys: Seq[String]): Column =
    xxhash64(keys.flatMap(k =>
      Seq(isnull(col(k)).cast("int"), col(k))): _*).cast("string")

  private[graft] def collapseHotBuckets(
      banded0: DataFrame,
      keys: Seq[String],
      maxBucketSize: Int,
      fineKey: Column,
      site: String): DataFrame = {
    val banded = materializeOnce(banded0)
    val (dropAcc, collAcc) = guardAccumulators(banded, site)
    val keyCols = keys.map(col)
    val over = banded.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucketSize)
      .select(keys.map(k => col(k).as(s"__o_$k")): _*)
    // NULL-SAFE membership: groupBy groups null keys into real buckets,
    // so the semi/anti split must match them too — an equi-join would
    // never match a null key, letting a hot null bucket bypass the
    // guard entirely (ungated quadratic join)
    val hotCond = keys.map(k => col(k) <=> col(s"__o_$k")).reduce(_ && _)
    val cold = banded.join(over, hotCond, "left_anti")
    val grouped = banded.join(over, hotCond, "left_semi")
      .withColumn("__fk", fineKey)
      .groupBy((keyCols :+ col("__fk")): _*)
      .agg(min(col("id")).as("id"), count(lit(1)).as("__grpn"))
    // per-bucket stats ride window functions over the SAME partitioning
    // the rank-cap already needs (no extra shuffle) and are recorded
    // ONCE per bucket from its rank-1 row — exact, see KeyedCountAcc.
    // collapse rows = Σ(group−1): an all-distinct hot bucket collapses
    // nothing and must not log as if it had; dropped reps =
    // max(0, groups − cap)
    val wb = org.apache.spark.sql.expressions.Window.partitionBy(keyCols: _*)
    val w = wb.orderBy(col("id"))
    // nondeterministic: the recording call must not be deduplicated,
    // reordered, or constant-folded by the optimizer
    val record = udf { (bk: String, coll: Long, groups: Long) =>
      collAcc.add((bk, coll))
      dropAcc.add((bk, math.max(0L, groups - maxBucketSize)))
      true
    }.asNondeterministic()
    val reps = grouped
      .withColumn("__rank", row_number().over(w))
      .withColumn("__coll", sum(col("__grpn") - 1).over(wb))
      .withColumn("__groups", count(lit(1)).over(wb))
      .withColumn("__rec", when(col("__rank") === 1,
        record(bucketKeyCol(keys), col("__coll"), col("__groups")))
        .otherwise(lit(true)))
      .filter(col("__rec") && col("__rank") <= maxBucketSize)
    val slim = keys :+ "id"
    cold.select(slim.map(col): _*)
      .unionByName(reps.select(slim.map(col): _*))
  }

  // --- Incremental corpus dedup ---------------------------------------
  // A 100 TB corpus grows by increments; re-banding the whole corpus
  // per batch is O(corpus) and dies first. These helpers persist the
  // MinHash band index as a graft PK table keyed on (band, bh) with a
  // collect-aggregated id list, so (a) the index is bucket-aligned
  // with the probe's join key and never reshuffles, (b) appends are
  // incremental upserts folded by the aggregation merge engine, and
  // (c) each new batch costs O(batch bands + matched buckets), never
  // O(corpus). (Reference capability class: paimon's global indexes
  // maintained across commits; the banding math is p05's.)

  /** Band rows of one batch: (band, bh, id, __sigh) — `__sigh` is the
    * full-signature hash (identical-content collapse key; extra
    * columns are ignored by consumers that only group on (band, bh)). */
  def bandRows(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8): DataFrame = {
    val rows = k / bands
    minhashSignatureTable(df, idCol, textCol, k)
      .select(col("id"), xxhash64(col("sig")).as("__sigh"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bh"))
        }: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bh").as("bh"),
        col("id"), col("__sigh"))
  }

  /** Create the persisted band index: PK (band, bh) + collect(ids),
    * so streaming/batch appends upsert and compaction folds. */
  def createBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String, buckets: Int = 8): graft.table.GraftTable =
    graft.table.GraftTable.create(spark, path,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("band",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("bh",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("ids",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType), nullable = true))),
      primaryKeys = Seq("band", "bh"),
      options = Map("bucket" -> buckets.toString,
        "merge-engine" -> "aggregation",
        "fields.ids.aggregate-function" -> "collect"))

  /** Register a batch's band rows in the index (one upsert commit). */
  def appendToBandIndex(
      index: graft.table.GraftTable, batch: DataFrame,
      idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8): Long =
    index.write(bandRows(batch, idCol, textCol, k, bands)
      .groupBy("band", "bh").agg(collect_list("id").as("ids")))

  /** Dedup one increment against the indexed corpus AND itself:
    * verified pairs, cross pairs oriented (id_a = corpus, id_b =
    * increment). Only matched index buckets are exploded — the join
    * touches O(increment bands) index rows. Over-cap increment buckets
    * COLLAPSE to one probe per distinct content instead of dropping:
    * collapsed members stay connected to the corpus through the
    * within-increment star pairs (same banding, same content key).
    * `corpusTexts` supplies (idCol, textCol) for the exact-Jaccard
    * verification reads. */
  def dedupIncrementPairs(
      index: graft.table.GraftTable,
      corpusTexts: DataFrame,
      increment: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.7, k: Int = 32, bands: Int = 8,
      maxBucketSize: Int = 1000): DataFrame = {
    // ONE banded frame feeds both sides (the probe and the
    // within-increment pairs) — materialized eagerly so the signature
    // UDF runs once per increment; the guarded helpers below detect
    // the checkpoint and don't re-materialize
    val banded = materializeOnce(bandRows(increment, idCol, textCol, k, bands))
    val incB = collapseHotBuckets(
      banded, Seq("band", "bh"), maxBucketSize, col("__sigh"), "minhash.inc")
    val cross = index.read
      .join(incB.withColumnRenamed("id", "id_b"), Seq("band", "bh"))
      .select(explode(col("ids")).as("id_a"), col("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val within = bucketJoinPairs(banded, Seq("band", "bh"), maxBucketSize,
      fineKey = col("__sigh"))
    val texts = corpusTexts.select(col(idCol), col(textCol))
      .unionByName(increment.select(col(idCol), col(textCol))).distinct()
    verifyJaccard(cross.unionByName(within).distinct(),
      texts, idCol, tokenSet(col(textCol)), threshold)
  }

  /** Self-join pairs of `banded` rows sharing bucket `keys`, with a
    * RECALL-PRESERVING skew guard.
    *
    * Buckets at or under `maxBucketSize` all-pairs join exactly as
    * before. An over-cap bucket (degenerate content: boilerplate,
    * empty docs — exactly what most wants deduping) is NOT dropped;
    * its rows collapse by `fineKey` (a hash of the row's FULL content
    * proxy — signature / simhash / vector), because an over-cap bucket
    * is dominated by content-identical rows:
    *  - each identical-content group emits STAR edges (group min-id →
    *    member), O(group) not O(group²) — connectivity-exact for the
    *    clustering these pairs feed, and every star pair verifies
    *    trivially downstream (jaccard 1 / hamming 0 / cosine 1);
    *  - one REPRESENTATIVE per group joins all-pairs within the bucket
    *    (distinct-content rows only), capped at `maxBucketSize` reps
    *    per bucket — the quadratic bound survives; only the rep
    *    overflow (many DISTINCT contents colliding, rare) is dropped,
    *    WARN-counted in [[skewDrops]].
    * Collapsed member rows are INFO-counted in [[collapseStats]] — the
    * no-silent-caps rule either way. Inside a hot bucket the emitted
    * pair set is connectivity-preserving rather than exhaustive (a
    * member-member pair across two groups is represented by its
    * rep-rep edge plus the stars).
    *
    * `payload` columns are carried onto pairs as `<c>_a`/`<c>_b` (for
    * star pairs both sides carry the member's value — the group shares
    * one fineKey, hence one content proxy). */
  /** @param subKeys when set, an array-of-long expression (over a hot
    *        bucket's columns) giving SECONDARY bucket keys for buckets
    *        whose DISTINCT-content representative count exceeds the
    *        cap: instead of rank-capping those reps, they re-bucket by
    *        each sub-key and pair within sub-buckets. With a
    *        pigeonhole-complete sub-key family (simhash sub-chunks)
    *        this is recall-EXACT one level down; only sub-bucket
    *        overflow still drops (WARN-counted). */
  private[graft] def bucketJoinPairs(
      banded0: DataFrame,
      keys: Seq[String],
      maxBucketSize: Int,
      fineKey: Column,
      payload: Seq[String] = Seq.empty,
      subKeys: Option[Column] = None): DataFrame = {
    val banded = materializeOnce(banded0)
    val (dropAcc, collAcc) = guardAccumulators(banded, keys.head)
    val keyCols = keys.map(col)
    val over = banded.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucketSize)
      .select(keys.map(k => col(k).as(s"__o_$k")): _*)
    // null-safe membership — see collapseHotBuckets: an equi-join
    // would let a hot null-keyed bucket bypass the guard
    val hotCond = keys.map(k => col(k) <=> col(s"__o_$k")).reduce(_ && _)
    val cold = banded.join(over, hotCond, "left_anti")
    val hotRows = banded.join(over, hotCond, "left_semi")
      .withColumn("__fk", fineKey)
    val groupKeys = keys :+ "__fk"
    // ONE aggregation yields both the representative id and its full
    // payload (min_by) per identical-content group — no second join
    // back over the hot rows. Collapse stats record HERE, once per
    // identical-content group keyed (bucket, fineKey) with the exact
    // collapsed count (group − 1) — last-write-wins, so re-evaluation
    // by the stars and pairs branches cannot double-count.
    // nondeterministic: recording calls must never be deduplicated,
    // reordered, or constant-folded by the optimizer
    val recordColl = udf { (bk: String, fk: String, gn: Long) =>
      collAcc.add((bk + "\u0002" + fk, gn - 1L))
      true
    }.asNondeterministic()
    val repPayload = payload.map(p => min_by(col(p), col("id")).as(p))
    // a NULL fineKey must not collide with the literal string "null"
    // (Java concat renders a null String as "null") — anchor it the
    // same way bucketKeyCol anchors null key values
    val fkAnchored = when(col("__fk").isNull, lit("\u0000"))
      .otherwise(concat(lit("\u0001"), col("__fk").cast("string")))
    val reps = hotRows.groupBy(groupKeys.map(col): _*)
      .agg(min(col("id")).as("__rep"), count(lit(1)).as("__gn") +: repPayload: _*)
      .withColumn("__recc",
        recordColl(bucketKeyCol(keys), fkAnchored, col("__gn")))
      .filter(col("__recc"))
      .drop("__gn", "__recc")
    val withRep = hotRows.select(
      (groupKeys.map(col) :+ col("id")) ++ payload.map(col): _*)
      .join(reps.select(groupKeys.map(k => col(k).as(s"__r_$k")) :+ col("__rep"): _*),
        groupKeys.map(k => col(k) <=> col(s"__r_$k")).reduce(_ && _))
    val pairCols = Seq(col("id_a"), col("id_b")) ++
      payload.flatMap(p => Seq(col(s"${p}_a"), col(s"${p}_b")))
    val stars = withRep.filter(col("id") =!= col("__rep"))
      .select(Seq(col("__rep").as("id_a"), col("id").as("id_b")) ++
        payload.flatMap(p => Seq(col(p).as(s"${p}_a"), col(p).as(s"${p}_b"))): _*)
    // one row per identical-content group; cap DISTINCT contents per
    // bucket so the rep join stays quadratic-bounded. Drops record
    // once per (sub-)bucket from its rank-1 row: exact overflow =
    // max(0, reps − cap), same keyed dedup as above.
    val recordDrop = udf { (bk: String, n: Long) =>
      dropAcc.add((bk, math.max(0L, n - maxBucketSize)))
      true
    }.asNondeterministic()
    val slim = (keys :+ "id") ++ payload
    val repRows0 = reps.withColumnRenamed("__rep", "id")
    def pairJoin(rows: DataFrame, joinKeys: Seq[String]): DataFrame = {
      val a = rows.select(joinKeys.map(col) ++ Seq(col("id").as("id_a")) ++
        payload.map(p => col(p).as(s"${p}_a")): _*)
      val b = rows.select(joinKeys.map(k => col(k).as(s"__j_$k")) ++
        Seq(col("id").as("id_b")) ++
        payload.map(p => col(p).as(s"${p}_b")): _*)
      // null-safe: rows sharing a null-keyed bucket pair like any other
      a.join(b, joinKeys.map(k => col(k) <=> col(s"__j_$k")).reduce(_ && _))
        .filter(col("id_a") < col("id_b")).select(pairCols: _*)
    }
    val pairs = subKeys match {
      case None =>
        // rank-cap over-cap reps (WARN-counted loss)
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols: _*)
        val w = wb.orderBy(col("id"))
        val repRows = repRows0
          .withColumn("__rank", row_number().over(w))
          .withColumn("__rn", count(lit(1)).over(wb))
          .withColumn("__rec", when(col("__rank") === 1,
            recordDrop(bucketKeyCol(keys), col("__rn"))).otherwise(lit(true)))
          .filter(col("__rec") && col("__rank") <= maxBucketSize)
          .select(slim.map(col): _*)
        pairJoin(cold.select(slim.map(col): _*).unionByName(repRows), keys)
      case Some(sk) =>
        // rep-hot buckets re-bucket by the secondary keys instead of
        // dropping: recall-exact one level down for pigeonhole-complete
        // families; only SUB-bucket overflow still rank-drops
        val repHot = repRows0.groupBy(keyCols: _*)
          .agg(count(lit(1)).as("__rn"))
          .filter(col("__rn") > maxBucketSize)
          .select(keys.map(k => col(k).as(s"__h_$k")): _*)
        val repHotCond = keys.map(k => col(k) <=> col(s"__h_$k")).reduce(_ && _)
        val repsCold = repRows0.join(repHot, repHotCond, "left_anti")
          .select(slim.map(col): _*)
        val subKeyNames = keys ++ Seq("__si", "__sv")
        val exploded = repRows0.join(repHot, repHotCond, "left_semi")
          .select(slim.map(col) :+ posexplode(sk).as(Seq("__si", "__sv")): _*)
        val w2b = org.apache.spark.sql.expressions.Window
          .partitionBy(subKeyNames.map(col): _*)
        val w2 = w2b.orderBy(col("id"))
        val subCapped = exploded
          .withColumn("__rank", row_number().over(w2))
          .withColumn("__rn", count(lit(1)).over(w2b))
          .withColumn("__rec", when(col("__rank") === 1,
            recordDrop(bucketKeyCol(subKeyNames), col("__rn"))).otherwise(lit(true)))
          .filter(col("__rec") && col("__rank") <= maxBucketSize)
        pairJoin(cold.select(slim.map(col): _*).unionByName(repsCold), keys)
          .unionByName(pairJoin(subCapped, subKeyNames))
    }
    pairs.unionByName(stars).distinct()
  }

  /** SemDeDup-style semantic deduplication (public method: Abbas et
    * al., arXiv:2303.09540 — the large-corpus recipe Meta published
    * for LAION/C4-scale pruning): k-means-cluster the embeddings,
    * then WITHIN each cluster greedily drop documents whose cosine to
    * an already-kept document reaches `threshold`, keeping the
    * lowest-id representative of every near-duplicate set.
    *
    * Spark shape: centroids train with the same deterministic
    * distributed Lloyd steps as the IVF index (seeded from the first
    * `nClusters` ids — reproducible, so the result is hash-gateable);
    * assignment is one argmax expression; the greedy pass runs
    * per-cluster via groupByKey, touching only same-cluster pairs —
    * the quadratic work is confined to one cluster, never the corpus
    * (the paper's own complexity bound). At 100 TB `nClusters` grows
    * with the corpus so a cluster's vectors fit one task; boundary
    * caveat (inherent to SemDeDup): near-duplicates that straddle a
    * centroid boundary are not compared.
    *
    * @return single-column DataFrame of surviving ids (named `idCol`)
    */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, threshold: Double = 0.95,
      iterations: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val trained = Similarity.trainIvf(corpus, idCol, vecCol, nClusters, iterations)
    val th = threshold
    trained.assigned // (neighbor_id, nvec UNIT vectors, list)
      .select(col("neighbor_id").cast("long"), col("nvec"), col("list"))
      .as[(Long, Seq[Double], Int)]
      .groupByKey(_._3)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._1) // keep-first = lowest id
        val kept = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        rows.foreach { case (id, v, _) =>
          val arr = v.toArray
          val dup = kept.exists { k =>
            var s = 0.0; var i = 0
            while (i < arr.length && i < k.length) { s += arr(i) * k(i); i += 1 }
            s >= th // unit vectors: dot IS cosine
          }
          if (!dup) { kept += arr; out += id }
        }
        out.iterator
      }.toDF(idCol)
  }

  /** Join candidate pairs back to per-doc set columns and keep pairs
    * with exact Jaccard >= threshold. */
  // --- exact substring (span-level) dedup -----------------------------

  /** Maximal duplicated token spans (the span analog of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 — their suffix-array substring dedup re-expressed
    * as distributed k-gram islands): a position is duplicated when its
    * k-token gram occurs at MORE THAN ONE (doc, position) anywhere in
    * the corpus (cross-doc or within-doc); adjacent duplicated
    * positions merge into maximal spans.
    *
    * Output: (doc_id, span_start, span_end) — 1-based inclusive token
    * indices into the whitespace tokenization of lower(trim(text)).
    *
    * Scale: gram extraction is per-row codegen; the only shuffle
    * groups grams by 64-bit hash (never the gram text — k tokens per
    * position would amplify the corpus k-fold through the exchange).
    * A hash collision conservatively marks a non-duplicate as
    * duplicated (~2^-64 per gram pair — acceptable for dedup). The
    * islands merge is a per-doc window over ONLY the duplicated
    * positions (a tiny fraction of the corpus). */
  def duplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val duppos = duplicatedPositions(docs, idCol, textCol, k)
    val w = Window.partitionBy("doc_id").orderBy("i")
    duppos
      .withColumn("grp", col("i") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("i").as("span_start"), (max(col("i")) + (k - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start").cast("long"),
        col("span_end").cast("long"))
  }

  /** (doc_id, i, h): every k-gram position with its gram hash,
    * restricted to positions whose gram occurs >1 time corpus-wide. */
  private def duplicatedPositions(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val toks = docs.select(col(idCol).as("doc_id"),
      split(trim(lower(col(textCol))), TextAnalysis.WsClass).as("t"))
    val grams = toks
      .filter(size(col("t")) >= k)
      // sequence(1, n) is DESCENDING when n < 1, hence the filter above
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("t")) - (k - 1))).as("i"),
        col("t"))
      .select(col("doc_id"), col("i"),
        xxhash64(array_join(slice(col("t"), col("i"), lit(k)), " ")).as("h"))
    val dup = grams.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("h")
    grams.join(dup, "h")
  }

  /** Remove duplicated spans, keeping ONE canonical occurrence of each
    * duplicated gram — the globally first (min doc_id, then min
    * position). Every other occurrence's k tokens are cut and the
    * text reassembled from the surviving tokens (Lee et al.'s
    * "drop all but one copy of each duplicated substring").
    *
    * Returns (doc_id, text) for EVERY input document (a fully-cut
    * document keeps an empty text rather than vanishing).
    *
    * Skew note: the per-gram ownership rank windows over a gram's
    * occurrence list — a boilerplate gram repeated millions of times
    * makes one window partition large (sort-based, spills, but
    * stragglers possible); cut such grams upstream via stopword-like
    * filtering if profiles show it. */
  def stripDuplicateSpans(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k must be >= 2, got $k")
    val toks = docs.select(col(idCol).as("doc_id"),
      split(trim(lower(col(textCol))), TextAnalysis.WsClass).as("t"))
    val grams = toks
      .filter(size(col("t")) >= k)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("t")) - (k - 1))).as("i"),
        col("t"))
      .select(col("doc_id"), col("i"),
        xxhash64(array_join(slice(col("t"), col("i"), lit(k)), " ")).as("h"))
    val own = Window.partitionBy("h").orderBy(col("doc_id"), col("i"))
    val removedPos = grams
      .withColumn("rn", row_number().over(own))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("n") > 1 && col("rn") > 1)
    val removedToks = removedPos
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (k - 1))).as("ti"))
      .distinct()
    val allToks = toks
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("ti"), col("tok"))
    val rebuilt = allToks
      .join(removedToks, Seq("doc_id", "ti"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ti"), col("tok")))),
        s => s.getField("tok")), " ").as("text"))
    docs.select(col(idCol).as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
  }

  private def verifyJaccard(
      cands: DataFrame,
      df: DataFrame,
      idCol: String,
      setCol: Column,
      threshold: Double): DataFrame = {
    val sets = df.select(col(idCol).as("vid"), setCol.as("vset"))
    cands
      .join(sets.withColumnRenamed("vid", "id_a").withColumnRenamed("vset", "set_a"), "id_a")
      .join(sets.withColumnRenamed("vid", "id_b").withColumnRenamed("vset", "set_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("set_a"), col("set_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
