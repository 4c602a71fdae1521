package graft

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only scale-growth spot bench for the round-14 paths (VERDICT
  * r14 task 4): bucket-key bucketed-append SPJ join (g73 shape),
  * chain-table read (post single-merge rewrite), and the
  * compacted-full scan mode. Run at two scales and compare wall
  * clock — growth should be ≲ linear in rows:
  *
  *   sbt 'Test/runMain graft.GrowthR14 1'
  *   sbt 'Test/runMain graft.GrowthR14 10'
  *
  * Timings print per path; structure assertions (no Exchange in the
  * SPJ join, one merge aggregate in the chain plan) guard that the
  * measured plan is the intended one at BOTH scales.
  */
object GrowthR14 {
  def main(args: Array[String]): Unit = {
    val f = if (args.nonEmpty) args(0).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.catalog.gr14", "graft.sources.GraftCatalog")
    val wh = java.nio.file.Files.createTempDirectory("graft-growth-wh").toString
    spark.conf.set("spark.sql.catalog.gr14.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gr14.d")

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[growth-r14] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // ---- 1. bucket-key bucketed-append SPJ join (g73 shape)
    val n1 = 200000L * f
    Seq("ba1", "ba2").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS gr14.d.$t")
      spark.sql(s"CREATE TABLE gr14.d.$t (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('bucket'='8', 'bucket-key'='k')")
    }
    val base = spark.range(n1).select(col("id").as("k"), (col("id") * 2).as("v"))
    time(s"bucketed-append write 2x${n1}") {
      base.writeTo("gr14.d.ba1").append()
      base.writeTo("gr14.d.ba2").append()
    }
    val joined = spark.table("gr14.d.ba1").alias("a")
      .join(spark.table("gr14.d.ba2").alias("b"), "k")
      .agg(sum(col("a.v") + col("b.v")).as("s"))
    val cnt = time(s"SPJ join ${n1}x${n1}")(joined.collect()(0).getLong(0))
    require(cnt == (0L until n1).map(i => 4L * i).sum, s"join sum wrong: $cnt")
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    require(exchanges == 0, s"SPJ join must not shuffle, found $exchanges:\n$plan")

    // ---- 2. chain-table read: fixed 1 snapshot + 20 delta days, rows
    // per day scale with f (the realistic 100-TB growth axis: day
    // volume grows, chain depth is bounded by the snapshot cadence)
    val csch = StructType(Seq(
      StructField("dt", IntegerType, nullable = false),
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    val rowsPerDay = 5000L * f
    val ct = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft-growth-chain").toString + "/t",
      csch, partitionKeys = Seq("dt"), primaryKeys = Seq("dt", "k"),
      options = Map(
        "sequence.field" -> "seq",
        "chain-table.enabled" -> "true",
        "scan.fallback-snapshot-branch" -> "snap",
        "scan.fallback-delta-branch" -> "delta"))
    val snapB = ct.createBranch("snap")
    val deltaB = ct.createBranch("delta")
    time(s"chain write 1 snap + 20 deltas x$rowsPerDay") {
      snapB.write(spark.range(rowsPerDay).select(lit(0).as("dt"),
        col("id").as("k"), lit(0L).as("v"), lit(0L).as("seq")))
      // each delta day upserts a sliding half of the keys
      val all = (1 to 20).map { d =>
        spark.range(d * 100L, d * 100L + rowsPerDay / 2).select(
          lit(d).as("dt"), col("id").as("k"),
          lit(d.toLong).as("v"), lit(d.toLong).as("seq"))
      }.reduce(_ unionByName _)
      deltaB.write(all)
    }
    val chainRead = ct.read
    val aggs = chainRead.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    require(aggs.size == 1, s"chain plan must stay one merge, got ${aggs.size}")
    (1 to 2).foreach { rep =>
      val c = time(s"chain read rep$rep")(chainRead.count())
      require(c > 20 * rowsPerDay / 2, s"chain count too small: $c")
    }

    // ---- 3. compacted-full: PK table, level-0 churn, compact, then
    // the settled-state scan + a compacted-full stream drain
    val n3 = 100000L * f
    spark.sql("DROP TABLE IF EXISTS gr14.d.cf")
    spark.sql("CREATE TABLE gr14.d.cf (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='4')")
    time(s"compacted-full setup $n3") {
      spark.range(n3).select(col("id").as("k"), col("id").as("v"))
        .writeTo("gr14.d.cf").append()
      spark.range(n3 / 2).select(col("id").as("k"), (col("id") + 1).as("v"))
        .writeTo("gr14.d.cf").append()
      GraftTable.load(spark, s"$wh/d/cf").compact()
      // post-compact churn the compacted-full scan must NOT serve
      spark.range(n3, n3 + 100).select(col("id").as("k"), col("id").as("v"))
        .writeTo("gr14.d.cf").append()
    }
    (1 to 2).foreach { rep =>
      val c = time(s"compacted-full batch scan rep$rep") {
        spark.read.option("scan.mode", "compacted-full")
          .table("gr14.d.cf").count()
      }
      require(c == n3, s"compacted-full scan served churn: $c vs $n3")
    }
    val got = new java.util.concurrent.atomic.AtomicLong()
    time("compacted-full stream drain") {
      val q = spark.readStream.option("scan.mode", "compacted-full")
        .table("gr14.d.cf").writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-growth-ck").toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.addAndGet(df.count()): Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "drain timed out")
    }
    require(got.get() == n3 + 100, s"stream drain rows: ${got.get()}")
    spark.stop()
  }
}
