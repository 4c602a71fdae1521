package graft

import graft.operators.{Bpe, Sampling, TextAnalysis => TA}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale-growth spot bench for the late-round-15 pipeline
  * operators (DSIR weighting, BPE vocabulary learning, Gopher rules):
  * synthetic corpora at two scales, wall-clock printed per path —
  * growth should be ≲ linear in rows:
  *
  *   sbt 'Test/runMain graft.GrowthPipeline 1'
  *   sbt 'Test/runMain graft.GrowthPipeline 10'
  *
  * Plan-shape guards assert the measured plan is the intended one at
  * BOTH scales: the hashed DSIR weight join must be a BROADCAST join
  * (the corpus side never shuffles token-wide rows), and the Gopher
  * flags projection must be exchange-free (one codegen'd pass).
  */
object GrowthPipeline {
  def main(args: Array[String]): Unit = {
    val f = if (args.nonEmpty) args(0).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[growth-pipe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // synthetic corpus: n docs, ~20 words each from a 1000-word
    // vocabulary, deterministic per id (no RNG — re-runs identical)
    val n = 100000L * f
    val docs = spark.range(n).select(col("id"),
      concat_ws(" ", (0 until 20).map(j =>
        concat(lit("w"), pmod(col("id") * 31 + j * 7, lit(1000)))): _*)
        .as("text"))
      .localCheckpoint() // pay generation once, measure the operators

    // ---- 1. DSIR exact + hashed (target = every 3rd doc)
    val target = docs.filter(col("id") % 3 === 0)
    val wexact = Sampling.importanceWeights(docs, target, "text")
    val sExact = time(s"dsir exact scores n=$n") {
      Sampling.importanceScores(docs, "id", "text", wexact)
        .agg(sum("iw_score")).collect()(0).getLong(0)
    }
    val hashedDf = Sampling.importanceScoresHashed(docs, target, "id", "text")
    val sHashed = time(s"dsir hashed scores n=$n") {
      hashedDf.agg(sum("iw_score")).collect()(0).getLong(0)
    }
    val hashedPlan = hashedDf.queryExecution.executedPlan.toString
    require(hashedPlan.contains("BroadcastHashJoin") ||
      hashedPlan.contains("BroadcastNestedLoopJoin"),
      s"hashed DSIR weight join is not broadcast:\n$hashedPlan")
    println(s"[growth-pipe] dsir sums exact=$sExact hashed=$sHashed " +
      s"(hashed within ${100.0 * math.abs(sHashed - sExact) / sExact}% of exact)")

    // ---- 2. BPE vocabulary learning (3 rounds; vocab is the 1000
    // synthetic words — rounds are vocabulary-scale by construction)
    val merges = time(s"bpe 3 merges n=$n") {
      Bpe.learnMerges(docs, "text", numMerges = 3).collect().toSeq
    }
    require(merges.size == 3, s"expected 3 merges, got $merges")

    // ---- 3. Gopher rules full scan (pure projection)
    val flags = docs.select(TA.gopherQualityFlags(col("text")).as("g"))
    val plan = flags.queryExecution.executedPlan.toString
    require(!plan.contains("Exchange"),
      s"gopher flags projection must be exchange-free:\n$plan")
    val kept = time(s"gopher flags n=$n") {
      flags.filter(col("g.keep")).count()
    }
    println(s"[growth-pipe] gopher kept=$kept of $n")

    // ---- 4. p27 capPerDomain at growth: 5000 sites on one hosting
    // platform. PSL mode caps per SITE (5000 groups); heuristic mode
    // collapses all of them into ONE domain — the deliberate skew case
    // the salted two-level rank exists for (no single-task window).
    val U = graft.operators.UrlCuration
    val urls = spark.range(n).select(col("id"),
      concat(lit("https://site"), pmod(col("id"), lit(5000)),
        lit(".github.io/page/"), col("id")).as("url"))
      .localCheckpoint()
    val capped = U.capPerDomain(urls, "url", "id", cap = 8L, psl = true)
    val cappedN = time(s"p27 capPerDomain psl n=$n") { capped.count() }
    // the FULL 9,506-rule bundled list in the UDF closure: per-site
    // grouping identical, cost must stay in family with the snapshot
    val cappedFull = U.capPerDomain(urls, "url", "id", cap = 8L,
      psl = true, pslRules = U.loadPsl())
    val cappedFullN = time(s"p27 capPerDomain full-psl n=$n") { cappedFull.count() }
    require(cappedFullN == cappedN,
      s"full-PSL grouping diverged: $cappedFullN vs $cappedN")
    val skewed = U.capPerDomain(urls, "url", "id", cap = 8L)
    val skewedN = time(s"p27 capPerDomain skew-1-domain n=$n") { skewed.count() }
    require(cappedN == math.min(n / 5000, 8L) * 5000 || cappedN == math.min(n, 8L * 5000),
      s"psl cap wrong: $cappedN")
    require(skewedN == math.min(n, 8L), s"skew cap wrong: $skewedN")
    // the exact-rank plan must keep WindowGroupLimit pushdown on both
    // rank levels at every scale — the guard that the skewed domain
    // never funnels its full row set through one sort task
    val capPlan = skewed.queryExecution.executedPlan.toString
    require("WindowGroupLimit".r.findAllIn(capPlan).size >= 2,
      s"capPerDomain lost WindowGroupLimit pushdown:\n$capPlan")

    // ---- 5. p28 hashed line dedup: per-doc unique lines + one
    // boilerplate line shared corpus-wide. The frequency shuffle
    // carries (hash, id) only; the anti join must stay broadcast with
    // the (tiny) verified boilerplate set as build side.
    val lined = docs.select(col("id"), concat_ws("\n",
      concat(lit("body "), col("text")),
      lit("COOKIE BANNER ACCEPT ALL"),
      concat(lit("unique "), col("id"))).as("ltext"))
    val deduped = TA.removeFrequentLinesHashed(lined, "id", "ltext", maxDocFreq = 100)
    val lineRows = time(s"p28 hashed line dedup n=$n") { deduped.count() }
    require(lineRows == n, s"line dedup lost docs: $lineRows of $n")
    val dedupPlan = deduped.queryExecution.executedPlan.toString
    require(dedupPlan.contains("BroadcastHashJoin") &&
      dedupPlan.contains("LeftAnti"),
      s"hashed line dedup anti join is not broadcast:\n$dedupPlan")
    spark.stop()
  }
}
