package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: reproduce the driver's Bench environment (local[N],
  * shuffle.partitions=N, AQE on) for a subset of gates, repeated, to
  * pin down run-to-run variance the full Bench can't isolate.
  *
  * sbt 'Test/runMain graft.BenchRepro /root/testdata/sf0.1 32 3 g22,g31'
  */
object BenchRepro {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, cpus, reps, prefixes) = args
    val wanted = prefixes.split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up as Bench
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.startsWith) }
    (1 to reps.toInt).foreach { rep =>
      sel.foreach { case (name, fn) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable => println(s"[repro] $name FAILED: $e") }
        val dt = (System.nanoTime() - t0) / 1e9
        System.gc()
        println(f"[repro] rep=$rep $name ${dt}%.2fs")
      }
    }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
  }
}
