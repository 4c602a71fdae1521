package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora: a document
  * is contaminated when it shares at least one word w-gram with a
  * benchmark (eval-set) document — the standard n-gram-overlap
  * decontamination check run before pretraining.
  *
  * Scale shape: the benchmark side is tiny (eval sets are thousands of
  * rows), so its distinct grams BROADCAST; the corpus explodes its
  * grams map-side and joins without shuffling a single corpus row.
  * Output is one row per contaminated document (hit count + an example
  * gram), so the result is bounded by contamination, not corpus size.
  */
object Contamination {

  /** Distinct word w-grams per row of `textCol` (lowercased,
    * whitespace-tokenized; documents shorter than w contribute their
    * whole text as one gram — matching [[TextAnalysis.shingles]]).
    * EMPTY grams are dropped: split("") yields [""], so one blank
    * benchmark row would otherwise share the "" gram with every
    * blank/whitespace corpus document and flag them all contaminated. */
  private def gramSet(textCol: String, w: Int) = {
    // Compiled one-pass loop (r17): the expression form
    // (filter∘array_distinct∘shingles) evaluated interpreted
    // higher-order functions per token position — slice + array_join
    // allocations per gram dominated the corpus-side stage. Gram
    // strings, first-occurrence-ordered dedup and the empty-gram drop
    // are byte-identical to the old form (null text still yields null
    // → explode drops the row).
    val gramsUdf = udf { (toks: Seq[String]) =>
      if (toks == null) null
      else {
        val n = toks.length
        val out = new java.util.LinkedHashSet[String]
        if (n < w) {
          val g = toks.mkString(" ")
          if (g.nonEmpty) out.add(g)
        } else {
          var i = 0
          while (i + w <= n) {
            val sb = new java.lang.StringBuilder
            var j = i
            while (j < i + w) { if (j > i) sb.append(' '); sb.append(toks(j)); j += 1 }
            // empty-gram drop must hold in BOTH branches: with w=1 a
            // blank document tokenizes to [""] and n >= w, so the ""
            // gram would otherwise flag every blank corpus doc against
            // one blank benchmark row (for w >= 2 joined grams are
            // never empty and this guard never fires)
            if (sb.length > 0) out.add(sb.toString)
            i += 1
          }
        }
        out.toArray(new Array[String](out.size))
      }
    }
    gramsUdf(TextAnalysis.tokens(col(textCol)))
  }

  /** Flag corpus documents sharing >= 1 word w-gram with `benchmark`.
    *
    * @return (idCol, n_hit_grams, example_gram) for contaminated
    *         documents only, one row each.
    */
  def flag(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 8): DataFrame = {
    val benchGrams = broadcast(
      benchmark.select(explode(gramSet(textCol, w)).as("g")).distinct())
    corpus
      .select(col(idCol), explode(gramSet(textCol, w)).as("g"))
      .join(benchGrams, "g") // broadcast hash join: corpus stays put
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_hit_grams"),
        min(col("g")).as("example_gram"))
  }
}
