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
