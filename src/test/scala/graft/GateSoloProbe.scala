package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: time ONE gate solo, n repetitions, with steal telemetry.
  * sbt 'Test/runMain graft.GateSoloProbe <gate> <sfDir> <reps>' */
object GateSoloProbe {
  def main(args: Array[String]): Unit = {
    val Array(gate, sfDir, repsS) = args.take(3)
    val reps = repsS.toInt
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(gate)
    def steal(): (Long, Long) = {
      val parts = scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+").drop(1).map(_.toLong)
      (parts.take(8).sum, parts(7))
    }
    (1 to reps).foreach { i =>
      val (t0, s0) = steal()
      val t = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t) / 1e9
      val (t1, s1) = steal()
      val st = if (t1 > t0) 100.0 * (s1 - s0) / (t1 - t0) else 0.0
      println(f"[solo] $gate rep$i $dt%.2fs steal=$st%.1f%%")
      System.gc()
    }
    spark.stop()
  }
}
