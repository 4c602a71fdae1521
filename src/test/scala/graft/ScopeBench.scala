package graft

import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only: the scope-threshold growth record (VERDICT r11 #6 /
  * r12 carry). Builds a dynamic-bucket PK table PAST
  * `dynamic-bucket.index.scope-threshold` (default 1M keys), then
  * measures a SMALL ingest's index-probe cost under (a) the scoped
  * sidecar layout and (b) the flat layout (threshold forced above the
  * table size) — printing probed-file counts (the telemetry
  * `lastDynProbeFiles` records) and wall times for BENCH_NOTES.
  *
  * sbt 'Test/runMain graft.ScopeBench 2000000 1000'
  */
object ScopeBench {
  def main(args: Array[String]): Unit = {
    val keys = if (args.length > 0) args(0).toLong else 2000000L
    val batch = if (args.length > 1) args(1).toLong else 1000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = true)))
    def run(label: String, opts: Map[String, String]): Unit = {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-scope-$label").toString + "/t"
      val t = GraftTable.create(spark, path, sch, primaryKeys = Seq("k"),
        options = Map("bucket" -> "-1",
          "dynamic-bucket.target-row-num" -> "200000") ++ opts)
      val bulk = spark.range(keys).select(col("id").as("k"), col("id").as("v"))
      var t0 = System.nanoTime()
      t.write(bulk)
      val bulkS = (System.nanoTime() - t0) / 1e9
      // three warm small ingests: NEW keys (worst case for pruning —
      // every range the batch's keys hash into must be probed)
      val times = (1 to 3).map { i =>
        val inc = spark.range(keys + i * batch, keys + (i + 1) * batch)
          .select(col("id").as("k"), col("id").as("v"))
        t0 = System.nanoTime()
        t.write(inc)
        (System.nanoTime() - t0) / 1e9
      }
      val sidecars = t.sm.latestSnapshot().flatMap(_.dynIndex)
        .getOrElse(Seq.empty)
      println(f"[scope] $label: keys=$keys batch=$batch " +
        f"bulk=${bulkS}%.1fs ingest=${times.map(x => f"$x%.2f").mkString("/")}s " +
        s"sidecars=${sidecars.size} probed=${t.lastDynProbeFiles.size}")
    }
    run("scoped", Map.empty) // default threshold 1M < keys -> scoped
    // finer range modulus: a tiny batch touches few of 64 hash-ranges,
    // so the probe prunes to O(batch ranges) slices
    run("scoped-r64", Map("dynamic-bucket.index.ranges" -> "64"))
    run("flat", Map("dynamic-bucket.index.scope-threshold" -> (keys * 10).toString))
    spark.stop()
  }
}
