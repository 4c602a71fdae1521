package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: every SparkEntry gate must be re-invocable within ONE
  * session — Bench's contamination retry re-runs a gate in place, so a
  * gate that only works once (fixed table name in a cached catalog,
  * leftover temp view state) silently turns the retry into a failure.
  * Runs the full board TWICE at the smallest SF and reports gates
  * whose second invocation throws.
  *
  *   sbt 'Test/runMain graft.GateIdempotenceProbe /root/testdata/sf0.001'
  */
object GateIdempotenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = List.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).count()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          bad ::= (name, "SECOND: " + e.toString.take(160))
        }
      } catch { case e: Throwable =>
        bad ::= (name, "FIRST: " + e.toString.take(160))
      }
    }
    if (bad.isEmpty) println("IDEMPOTENCE OK: every gate re-invocable")
    else {
      println(s"IDEMPOTENCE FAILURES (${bad.size}):")
      bad.reverse.foreach { case (n, e) => println(s"  $n -> $e") }
    }
    spark.stop()
  }
}
