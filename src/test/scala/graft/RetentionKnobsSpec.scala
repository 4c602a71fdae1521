package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Commit-coupled partition expiry (reference: operation/PartitionExpire
  * + partition.expiration-* options), the wide-table stats bounds
  * (metadata.stats-keep-first-n-columns, metadata.stats-mode.per.level)
  * and snapshot.clean-empty-directories. */
class RetentionKnobsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-rk").toString + "/t"

  private def dtRows(rows: (String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("dt", "k")
  }

  test("partition.expiration-time expires old partitions on commit, oldest-first within max-num") {
    val t = GraftTable.create(spark, tmp(), dtRows("x" -> 1L).schema,
      partitionKeys = Seq("dt"),
      options = Map(
        "partition.expiration-time" -> "7d",
        "partition.expiration-check-interval" -> "0ms",
        "partition.expiration-max-num" -> "1"))
    t.write(dtRows("2020-01-01" -> 1L, "2020-01-02" -> 2L, "2099-01-01" -> 3L))
    // the write's own commit hook ran the expiry: max-num=1 drops ONLY
    // the oldest expired partition
    val live1 = t.read.collect().map(_.getString(0)).toSet
    assert(live1 == Set("2020-01-02", "2099-01-01"), live1)
    // next commit drains the next-oldest
    t.write(dtRows("2099-01-02" -> 4L))
    val live2 = t.read.collect().map(_.getString(0)).toSet
    assert(live2 == Set("2099-01-01", "2099-01-02"), live2)
  }

  test("expiration-batch-size splits one pass into multiple DELETE commits") {
    val t = GraftTable.create(spark, tmp(), dtRows("x" -> 1L).schema,
      partitionKeys = Seq("dt"))
    t.write(dtRows("2020-01-01" -> 1L, "2020-01-02" -> 2L,
      "2020-01-03" -> 3L, "2099-01-01" -> 9L))
    val before = t.sm.snapshotIds.size
    val dropped = t.expirePartitionsByTime(
      7L * 86400000L, batchSize = 1)
    assert(dropped.size == 3)
    assert(t.sm.snapshotIds.size == before + 3) // one commit per batch
    assert(t.read.collect().map(_.getString(0)).toSet == Set("2099-01-01"))
  }

  test("metadata.stats-keep-first-n-columns drops stats past the first N schema columns") {
    import spark.implicits._
    val df = Seq((1L, "aaa", 5.0)).toDF("a", "b", "c")
    val t = GraftTable.create(spark, tmp(), df.schema,
      options = Map("metadata.stats-keep-first-n-columns" -> "1"))
    t.write(df)
    val stats = t.sm.latestSnapshot().map(t.sm.liveEntries).get.head.file.stats
    assert(stats.contains("a"), stats.keySet)
    assert(!stats.contains("b") && !stats.contains("c"), stats.keySet)
  }

  test("metadata.stats-mode.per.level: none at ingest level 0, full after compaction") {
    import spark.implicits._
    val df = Seq((1L, "alpha")).toDF("k", "v")
    val t = GraftTable.create(spark, tmp(), df.schema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "1",
        "metadata.stats-mode.per.level" -> "0:none"))
    t.write(df)
    val l0 = t.sm.latestSnapshot().map(t.sm.liveEntries).get.head.file
    // only USER columns are bounded; the hidden seq/kind stats stay
    // (they drive merge planning, not user-predicate pruning)
    assert(l0.level == 0 &&
      !l0.stats.contains("k") && !l0.stats.contains("v"), l0)
    t.compact()
    val l1 = t.sm.latestSnapshot().map(t.sm.liveEntries).get.head.file
    assert(l1.level > 0 && l1.stats.get("v").exists(_.min.contains("alpha")), l1)

    // append table: exact-value pushdown declines while a live file was
    // written under a non-full LEVEL mode (level 0 here)
    val a = GraftTable.create(spark, tmp(), df.schema,
      options = Map("metadata.stats-mode.per.level" -> "0:counts"))
    a.write(df)
    assert(a.statsMinMax("v").isEmpty, "level-0 counts mode must decline")
  }

  test("num-sorted-run.compaction-trigger fires on run count below the file-num trigger") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    val t = GraftTable.create(spark, tmp(), df.schema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "1",
        "num-sorted-run.compaction-trigger" -> "2"))
    t.write(Seq((1L, "a")).toDF("k", "v"))
    assert(t.compactIfNeeded().isEmpty, "one run must not trigger")
    t.write(Seq((2L, "b")).toDF("k", "v"))
    // two level-0 runs >= trigger 2, even though file count (2) is far
    // below the default min.file-num trigger (5)
    assert(t.compactIfNeeded().isDefined)
    val files = t.sm.latestSnapshot().map(t.sm.liveEntries).get
    assert(files.forall(_.file.level > 0))
  }

  test("source.split.target-size bounds bin-packed split sizes") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toLong, "v" * 50)).toDF("k", "v")
    val t = GraftTable.create(spark, tmp(), df.schema)
    t.write(df.repartition(4)) // four separate data files
    val entries = t.sm.latestSnapshot().map(t.sm.liveEntries).get
    assert(entries.size == 4, entries.size)
    val sch = org.apache.spark.sql.types.StructType(Nil)
    val one = graft.sources.GraftScanUtil.filePartitions(
      spark, t.path, entries, sch, targetSize = Some(1L))
    assert(one.length == 4, "1-byte target → one file per split")
    val all = graft.sources.GraftScanUtil.filePartitions(
      spark, t.path, entries, sch, targetSize = Some(1L << 30))
    assert(all.length < 4, "1gb target packs files together")
    // option resolution: read option wins over table option, sizes parse
    assert(graft.sources.GraftScanUtil.splitTargetSize(
      Map("source.split.target-size" -> "64mb"),
      Map("source.split.target-size" -> "1gb")).contains(64L << 20))
    assert(graft.core.Meta.parseBytes("512") == 512L)
    assert(graft.core.Meta.parseBytes("4 kb") == 4096L)
  }

  test("snapshot.clean-empty-directories sweeps partition dirs emptied by expiration") {
    val t = GraftTable.create(spark, tmp(), dtRows("x" -> 1L).schema,
      partitionKeys = Seq("dt"),
      options = Map("snapshot.clean-empty-directories" -> "true"))
    t.write(dtRows("2020-01-01" -> 1L, "2020-01-02" -> 2L))
    t.delete(org.apache.spark.sql.functions.col("dt") === "2020-01-01")
    val dir = Paths.get(s"${t.path}/data/dt=2020-01-01")
    assert(Files.isDirectory(dir), s"expected partition dir before expire: $dir")
    t.expireSnapshots(retain = 1)
    assert(!Files.exists(dir), "emptied partition dir should be swept")
    // the surviving partition's directory is untouched
    assert(Files.isDirectory(Paths.get(s"${t.path}/data/dt=2020-01-02")))
    assert(t.read.count() == 1L)
  }
}
