package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: split-pattern throughput A/B on the real documents. */
object RegexSplitProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
      .localCheckpoint()
    def bench(label: String, pat: String): Unit = (1 to 3).foreach { i =>
      val t = System.nanoTime()
      val n = docs.select(explode(array_distinct(
        split(trim(lower(col("text"))), pat))).as("t"))
        .groupBy("t").count().count()
      println(f"[re] $label rep$i ${(System.nanoTime() - t) / 1e9}%.2fs distinct=$n")
    }
    bench("\\s+", "\\s+")
    bench("class", "[\\t\\n\\f\\r ]+")
    bench("\\s+again", "\\s+")
    spark.stop()
  }
}
