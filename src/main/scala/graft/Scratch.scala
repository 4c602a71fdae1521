package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad main for debugging single queries. Not shipped API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    df.show(20, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
