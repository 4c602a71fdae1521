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
    spark.stop()
  }
}
