package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: batched-BPE round count at production-ish merge counts
  * on the real documents corpus. Run:
  * Test/runMain graft.BpeRoundProbe /root/testdata/sf0.01 256 64 */
object BpeRoundProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
    val n = args(1).toInt
    val w = args(2).toInt
    val t0 = System.nanoTime()
    val (bdf, rounds) = graft.operators.Bpe.learnMergesBatchedCounted(
      docs, "text", numMerges = n, maxBatch = w)
    val got = bdf.count()
    val tBatched = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val auto = graft.operators.Bpe.learnMergesAuto(docs, "text", numMerges = n).count()
    val tAuto = (System.nanoTime() - t1) / 1e9
    println(s"RESULT merges=$got rounds=$rounds batchedSec=$tBatched" +
      s" autoMerges=$auto autoSec=$tAuto")
    spark.stop()
  }
}
