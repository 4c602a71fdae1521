package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) VOCABULARY LEARNING — the
  * counting side of tokenizer training over a corpus (Sennrich et al.,
  * 2016), as opposed to the pre-tokenizer COUNTING in
  * [[TextAnalysis.bpeTokenCount]] which applies a fixed pattern.
  *
  * The classic trainer operates on the word-frequency table, not the
  * raw corpus: one corpus-sized pass builds `(word, freq)` (vocabulary
  * scale — millions of rows at 100 TB, never the corpus itself), and
  * every merge round is then a vocabulary-sized job: count adjacent
  * symbol pairs weighted by word frequency (map-side-combinable agg),
  * take the argmax on the driver (a ONE-ROW collect), and rewrite each
  * word's symbol sequence with the merge applied. `numMerges` rounds =
  * `numMerges` shuffles over the vocabulary table — the standard
  * distributed-BPE shape; lineage is truncated per round so round N
  * plans O(1) work, not O(N).
  *
  * Deterministic by construction: pair counts are exact integer sums,
  * ties break on (count desc, left asc, right asc) in binary string
  * order, and the merge APPLICATION is greedy left-to-right
  * non-overlapping — `[a,a,a]` under merge (a,a) becomes `[aa,a]`.
  * Both phases count/apply exactly what the reference BPE algorithm
  * does (counting sees overlapping pairs: `[a,a,a]` contributes
  * (a,a) twice; application consumes greedily).
  */
object Bpe {

  /** Lowercase whitespace word-frequency table: `(word, freq)`. The
    * single corpus-sized pass of the trainer. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(
        split(trim(lower(col(textCol))), TextAnalysis.WsClass), t => t =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` merges from the corpus. Returns one row per
    * merge: `(rank, left, right, pair_count)` with rank 1-based in
    * learning order. Stops early when no pair reaches `minPairCount`.
    */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 1L): DataFrame = {
    require(numMerges >= 0, s"bad numMerges $numMerges")
    val spark = df.sparkSession
    var words = wordFreq(df, textCol)
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .select(col("syms"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // adjacent (possibly overlapping) pairs, weighted by word freq —
      // guard single-symbol words (Spark's sequence(1, 0) descends)
      val pairs = words
        .filter(size(col("syms")) > 1)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      val best = pairs.orderBy(desc("cnt"), col("l"), col("r")).limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, cnt))
        val prev = words
        words = words
          .withColumn("syms", mergeUdf(col("syms"), lit(l), lit(r)))
          .localCheckpoint()
        prev.unpersist()
        rank += 1
      }
    }
    words.unpersist()
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.result().map { case (a, b, c, d) => Row(a, b, c, d) }, 1),
      schema)
  }

  /** [[learnMerges]] with BATCHED rounds — the wall-clock scale path.
    * Sequential BPE needs one Spark job per merge, so a production
    * 32 K-merge vocabulary is 32 K sequential jobs: hours of scheduler
    * overhead independent of data size. This variant learns up to
    * `maxBatch` merges per round and provably returns THE IDENTICAL
    * merge list (same pairs, same order, same counts):
    *
    * Per round it collects the top-K pairs under the total order
    * (count desc, left, right) and accepts the maximal PREFIX such
    * that every accepted pair
    *
    *  1. shares no symbol with an earlier accepted pair (their counts
    *     are then invariant under each other's application — a merge
    *     only disturbs adjacencies touching its own symbols),
    *  2. has a concatenation that is NOT an existing symbol (else the
    *     merge manufactures more of that symbol and a pre-existing
    *     pair like (lr, c) could grow past later candidates), and
    *  3. counts strictly above both the first conflicting candidate
    *     and the collection horizon (anything at or below those bounds
    *     caps every pair the accepted merges can disturb or create, so
    *     a tie could re-order the sequential argmax; strictness keeps
    *     the prefix exactly what sequential rounds would pick).
    *
    * The first candidate is always accepted (it is the exact global
    * argmax), so every round makes progress and the worst case
    * degrades to the sequential algorithm, never past it. The symbol
    * set needed for rule 2 is tiny by construction (alphabet + one per
    * learned merge) and is collected once per round. */
  def learnMergesBatched(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 1L,
      maxBatch: Int = 64): DataFrame =
    learnMergesBatchedCounted(df, textCol, numMerges, minPairCount, maxBatch)._1

  /** [[learnMergesBatched]] plus the number of Spark rounds it took —
    * the quantity the batching exists to shrink (spec/bench surface).
    *
    * @param precomputedWordFreq a `(word, freq)` table to train on
    *        INSTEAD of re-deriving [[wordFreq]] from `df` — the entry
    *        point for callers (like [[learnMergesAuto]]) that already
    *        paid the corpus pass; `df`/`textCol` are ignored when set
    *        except for the SparkSession. */
  def learnMergesBatchedCounted(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 1L,
      maxBatch: Int = 64,
      precomputedWordFreq: Option[DataFrame] = None): (DataFrame, Int) = {
    require(numMerges >= 0, s"bad numMerges $numMerges")
    require(maxBatch >= 1, s"bad maxBatch $maxBatch")
    val spark = df.sparkSession
    var words = precomputedWordFreq.getOrElse(wordFreq(df, textCol))
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .select(col("syms"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var rounds = 0
    var done = false
    while (rank <= numMerges && !done) {
      rounds += 1
      val multi = words.filter(size(col("syms")) > 1)
      val pairs = multi
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      // K rows bound one driver collect; vocabulary-scale tables are
      // usually exhausted well before it, making the horizon exact
      val k = math.min(4096, math.max(64, maxBatch * 8))
      val top = pairs.orderBy(desc("cnt"), col("l"), col("r")).limit(k).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
      else {
        val horizon = if (top.length == k) top.last.getLong(2) else -1L
        // rule-2 symbol set: tiny (alphabet + merges), one cheap agg
        val symbols = multi
          .select(explode(col("syms")).as("s")).distinct()
          .collect().map(_.getString(0)).toSet
        val budget = math.min(maxBatch, numMerges - rank + 1)
        val accepted = Seq.newBuilder[(String, String, Long)]
        val touched = scala.collection.mutable.Set.empty[String]
        var stopCnt = -1L // count of the first conflicting candidate
        var n = 0
        var i = 0
        while (stopCnt < 0 && n < budget && i < top.length) {
          val (l, r, cnt) =
            (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          if (cnt < minPairCount) stopCnt = Long.MaxValue // nothing below qualifies
          else if (n == 0) {
            // the global argmax: always exact, always accepted
            accepted += ((l, r, cnt))
            touched ++= Seq(l, r, l + r)
            n += 1
            if (symbols.contains(l + r)) stopCnt = cnt // rule 2: solo round
          } else if (touched.contains(l) || touched.contains(r) ||
            symbols.contains(l + r)) stopCnt = cnt
          else if (cnt <= horizon) stopCnt = cnt // unseen pairs could tie
          else {
            accepted += ((l, r, cnt))
            touched ++= Seq(l, r, l + r)
            n += 1
          }
          i += 1
        }
        // rule 3: drop trailing accepts that tie the conflict bound
        // (never the head — it is exact regardless). The bound is the
        // count of the first candidate we did NOT accept for ANY
        // reason — conflict, budget, or the collection horizon: an
        // unexamined pair at that count could interact with an earlier
        // accept and spawn/regrow a tying pair whose fresh symbols
        // win the lexicographic tie-break sequentially.
        val budgetStop =
          if (stopCnt < 0 && i < top.length) top(i).getLong(2) else -1L
        val bound =
          if (stopCnt == Long.MaxValue) math.max(horizon, budgetStop)
          else math.max(math.max(stopCnt, horizon), budgetStop)
        val batch = {
          val all = accepted.result()
          all.head +: all.tail.filter(_._3 > bound)
        }
        batch.foreach { case (l, r, cnt) =>
          merges += ((rank, l, r, cnt)); rank += 1
        }
        val prev = words
        words = words
          .withColumn("syms", mergeAllUdf(col("syms"),
            typedLit(batch.map(m => Seq(m._1, m._2)))))
          .localCheckpoint()
        prev.unpersist()
      }
    }
    words.unpersist()
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    (spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.result().map { case (a, b, c, d) => Row(a, b, c, d) }, 1),
      schema), rounds)
  }

  /** The 32 K-merge wall-clock path: ONE corpus-scale Spark job builds
    * the word-frequency table; when that table is vocabulary-scale
    * (it almost always is — merges per round are bounded by it, and a
    * 100 TB corpus still has ~10⁶-10⁸ distinct words), the classic
    * exact trainer runs ON THE DRIVER with incremental pair counts:
    * every merge is O(affected words), not a Spark job, so a 32 K-merge
    * vocabulary takes seconds instead of 32 K scheduler round-trips.
    * Returns EXACTLY [[learnMerges]]' list — same counting (overlap
    * pairs weighted by word freq), same (count desc, left, right)
    * argmax, same greedy left-to-right application.
    *
    * [[learnMergesAuto]] picks this path when the vocabulary fits and
    * falls back to the distributed batched rounds when it does not. */
  def learnMergesLocal(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val wf = wordFreq(df, textCol).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    localTrainer(spark, wf, numMerges, minPairCount)
  }

  /** In-memory exact BPE over a (word, freq) table: pair counts in an
    * ordered set for O(log P) argmax, with a pair→words index so each
    * merge re-counts only the words containing it (the standard
    * trainer shape, e.g. Sennrich 2016 reference implementation). */
  private def localTrainer(
      spark: SparkSession,
      wf: Array[(String, Long)],
      numMerges: Int,
      minPairCount: Long): DataFrame = {
    require(numMerges >= 0, s"bad numMerges $numMerges")
    import scala.collection.mutable
    // per-word symbol sequences, segmented by CODE POINT like the
    // distributed rounds (Spark substring counts code points)
    val syms: Array[mutable.ArrayBuffer[String]] =
      wf.map { case (w, _) => mutable.ArrayBuffer(codePointSymbols(w): _*) }
    val freqs: Array[Long] = wf.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // ordered view for argmax: (-count, left, right)
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.String, Ordering.String)
    val heap = mutable.TreeSet.empty[(Long, String, String)]
    def addPair(p: (String, String), f: Long, w: Int): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old > 0) heap.remove((old, p._1, p._2))
      counts(p) = old + f
      heap.add((old + f, p._1, p._2))
      where.getOrElseUpdate(p, mutable.Set.empty) += w
    }
    def dropPair(p: (String, String), f: Long, w: Int, stillThere: Boolean): Unit = {
      val old = counts(p)
      heap.remove((old, p._1, p._2))
      if (old == f) { counts.remove(p); where.remove(p) }
      else {
        counts(p) = old - f
        heap.add((old - f, p._1, p._2))
        if (!stillThere) where.get(p).foreach(_ -= w)
      }
    }
    syms.indices.foreach { w =>
      val s = syms(w)
      var i = 0
      while (i + 1 < s.length) { addPair((s(i), s(i + 1)), freqs(w), w); i += 1 }
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done && heap.nonEmpty) {
      val (cnt, l, r) = heap.head
      if (cnt < minPairCount) done = true
      else {
        merges += ((rank, l, r, cnt))
        val affected = where.get((l, r)).map(_.toArray).getOrElse(Array.empty)
        affected.foreach { w =>
          val before = syms(w)
          val after = mutable.ArrayBuffer(
            applyMerge(before.toSeq, l, r): _*)
          if (after.length != before.length) {
            // retract the word's old pair multiset, add the new one —
            // counting stays the exact overlap-pair definition
            val f = freqs(w)
            val oldPairs = before.indices.dropRight(1)
              .map(i => (before(i), before(i + 1)))
            val newPairs = after.indices.dropRight(1)
              .map(i => (after(i), after(i + 1)))
            val newSet = newPairs.toSet
            oldPairs.foreach(p => dropPair(p, f, w, stillThere = newSet.contains(p)))
            newPairs.foreach(p => addPair(p, f, w))
            syms(w) = after
          }
        }
        rank += 1
      }
    }
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.result().map { case (a, b, c, d) => Row(a, b, c, d) }, 1),
      schema)
  }

  /** Routing predicate of [[learnMergesAuto]], factored out so the
    * contract is directly testable: the driver trainer is taken only
    * when BOTH the distinct-word count and the total symbol count
    * (summed code-point word length — what [[localTrainer]]'s memory
    * is actually proportional to) fit their caps. A corpus of few but
    * very LONG words (URLs, code identifiers, agglutinative text)
    * routes to the distributed rounds even under the vocab cap. */
  def routeLocal(vocab: Long, totalSymbols: Long,
      maxLocalVocab: Long, maxLocalSymbols: Long): Boolean =
    vocab <= maxLocalVocab && totalSymbols <= maxLocalSymbols

  /** Production entry point: ONE corpus pass builds the word-frequency
    * table (persisted, so routing stats, the driver collect and the
    * batched fallback all reuse it — no second corpus scan on any
    * path), then the driver-side exact trainer when the table fits,
    * else the distributed batched rounds. Either path returns the
    * exact sequential merge list.
    *
    * Driver-memory contract of the local path: [[localTrainer]] holds
    * every word's symbol sequence plus pair-count/pair→word indexes —
    * ~150-250 bytes of boxed JVM structures PER SYMBOL (code point),
    * so the bound that matters is `sum(length(word))`, NOT the
    * distinct-word count (8 M short words fit easily; 8 M URLs do
    * not). The default `maxLocalSymbols` of 16 M symbols caps the
    * trainer's working set at roughly 4 GB of driver heap; lower it
    * for small drivers, raise it only with driver memory to match.
    * Past either cap the batched rounds take over — same answer,
    * nothing on the driver beyond top-K collects. */
  def learnMergesAuto(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 1L,
      maxLocalVocab: Long = 8000000L,
      maxBatch: Int = 64,
      maxLocalSymbols: Long = 16000000L): DataFrame = {
    val wf = wordFreq(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // vocabulary-scale agg over the persisted table: distinct words
      // AND total symbols in one job (length() counts code points,
      // matching the per-code-point segmentation both trainers use)
      val stats = wf.agg(
        count(lit(1)).as("vocab"),
        coalesce(sum(length(col("word"))), lit(0L)).as("syms")).head()
      if (routeLocal(stats.getLong(0), stats.getLong(1),
          maxLocalVocab, maxLocalSymbols))
        localTrainer(df.sparkSession,
          wf.collect().map(r => (r.getString(0), r.getLong(1))),
          numMerges, minPairCount)
      else
        learnMergesBatchedCounted(df, textCol, numMerges, minPairCount,
          maxBatch, precomputedWordFreq = Some(wf))._1
    } finally wf.unpersist()
  }

  /** Tokenize `textCol` with a LEARNED merge list: each lowercase
    * whitespace word is split to characters and the merges replay in
    * rank order (the standard BPE encode). Returns the input plus a
    * `bpe_tokens` array column. The merge list rides to executors as a
    * broadcast-sized literal — vocab learning is heavy, encoding is an
    * embarrassingly-parallel map. */
  def encode(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = encodeUdf(merges)
    df.withColumn("bpe_tokens", enc(col(textCol)))
  }

  /** One greedy left-to-right application of merge (l, r) to a symbol
    * sequence — the merge-round rewrite. */
  private val mergeUdf = udf { (syms: Seq[String], l: String, r: String) =>
    applyMerge(syms, l, r)
  }

  /** A batched round's rewrite: the accepted merges applied IN ORDER
    * (batch compatibility makes the order immaterial for counts, but
    * in-order application keeps the rewrite literally the sequential
    * one). */
  private val mergeAllUdf = udf { (syms: Seq[String], ms: Seq[Seq[String]]) =>
    var s = syms
    ms.foreach { m => s = applyMerge(s, m(0), m(1)) }
    s
  }

  private def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Split a word into per-CODE-POINT symbols — the same segmentation
    * [[learnMerges]] uses (Spark's `substring` counts code points, not
    * UTF-16 units), so learned merges apply to non-BMP characters
    * instead of seeing unmatched surrogate halves. */
  private def codePointSymbols(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  private def encodeUdf(merges: Seq[(String, String)]) = udf { (text: String) =>
    if (text == null) Seq.empty[String]
    else text.trim.toLowerCase.split(TextAnalysis.WsClass).toSeq.filter(_.nonEmpty).flatMap { w =>
      var syms: Seq[String] = codePointSymbols(w)
      merges.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
      syms
    }
  }
}
