package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The persisted dynamic-bucket (pk → bucket) index: writes append
  * only the batch's NEW keys as index-dyn/ sidecars instead of
  * re-scanning the table, the assigner joins against those sidecars,
  * compaction bounds the file list, GC reclaims unreferenced sidecars,
  * and pre-index tables bootstrap transparently. */
class DynamicBucketIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-dyn").toString + "/t"

  import scala.jdk.CollectionConverters._

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("seq", LongType, nullable = true)))

  private def df(rows: (Long, String, Long)*): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, sch)

  private def create(dir: String, extra: Map[String, String] = Map.empty) =
    GraftTable.create(spark, dir, sch, primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "bucket" -> "-1",
        "dynamic-bucket.target-row-num" -> "20",
        "dynamic-bucket.index.ranges" -> "2",
        // tests exercise the scoped (big-table) layout at toy sizes
        "dynamic-bucket.index.scope-threshold" -> "0") ++ extra)

  private def indexFiles(t: GraftTable): Seq[String] =
    t.sm.latestSnapshot().flatMap(_.dynIndex).getOrElse(Seq.empty)

  test("writes maintain an index that is key-sized, not version-sized") {
    val t = create(tmp())
    t.write(df((0L until 30L).map(i => (i, s"a$i", 1L)): _*))
    assert(indexFiles(t).nonEmpty, "first write must persist the index")
    // three more writes re-upserting the SAME keys: versions triple,
    // the index must not grow beyond the distinct key count
    (2L to 4L).foreach(s =>
      t.write(df((0L until 30L).map(i => (i, s"u${s}_$i", s)): _*)))
    val files = indexFiles(t)
    val idx = spark.read.parquet(files.map(f => s"${t.path}/$f"): _*)
    assert(idx.count() == 30L, "index holds one row per distinct key")
    assert(idx.select("k").distinct().count() == 30L)
    // raw data has 4 versions per key — the index is 4x smaller
    val raw = t.readRaw(t.sm.latestSnapshot().map(t.sm.liveEntries).get)
    assert(raw.count() == 120L)
    // merged read correct; keys never moved buckets
    assert(t.read.count() == 30L)
    assert(t.read.filter(col("k") === 5L).head.getString(1) == "u4_5")
    val dup = raw.select(col("k"), col("__bucket")).distinct()
      .groupBy("k").count().filter(col("count") > 1).count()
    assert(dup == 0)
    // index agrees with the data's actual buckets
    val dataBuckets = raw.select(col("k"), col("__bucket")).distinct()
    val mismatches = idx.as("i")
      .join(dataBuckets.as("d"), Seq("k"))
      .filter(col("i.__bucket") =!= col("d.__bucket")).count()
    assert(mismatches == 0, "index bucket must equal the data's bucket")
  }

  test("delta appends grow the list by one file; compaction rewrites it") {
    val t = create(tmp(), Map("dynamic-bucket.index.compact-trigger" -> "3"))
    t.write(df((0L until 10L).map(i => (i, "a", 1L)): _*))
    val n1 = indexFiles(t).size // full write (<=4 files)
    t.write(df((10L until 20L).map(i => (i, "b", 1L)): _*))
    assert(indexFiles(t).size == n1 + 1, "delta append adds one file")
    t.write(df((20L until 30L).map(i => (i, "c", 1L)): _*))
    // list reached the trigger → this write rewrote the index
    val afterCompact = indexFiles(t)
    assert(afterCompact.size <= 4,
      s"compaction should bound the list, got ${afterCompact.size}")
    val idx = spark.read.parquet(afterCompact.map(f => s"${t.path}/$f"): _*)
    assert(idx.count() == 30L)
    assert(t.read.count() == 30L)
  }

  test("pre-index tables bootstrap the index from the table once") {
    val t = create(tmp())
    t.write(df((0L until 15L).map(i => (i, "a", 1L)): _*))
    // simulate a table written before the index existed: strip the
    // dynIndex field from the latest snapshot
    val snapPath = s"${t.path}/snapshot/snapshot-0.json"
    val stripped = graft.core.Json.mapper.readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(snapPath)))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    stripped.remove("dynIndex")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(snapPath), stripped.toString)
    val t2 = GraftTable.load(spark, t.path)
    assert(indexFiles(t2).isEmpty, "legacy snapshot has no index")
    // next write bootstraps: existing keys keep buckets, index restored
    t2.write(df((0L until 20L).map(i => (i, "b", 2L)): _*))
    val files = indexFiles(t2)
    assert(files.nonEmpty, "bootstrap must persist a full index")
    val idx = spark.read.parquet(files.map(f => s"${t2.path}/$f"): _*)
    assert(idx.count() == 20L)
    assert(t2.read.count() == 20L)
    val raw = t2.readRaw(t2.sm.latestSnapshot().map(t2.sm.liveEntries).get)
    val dup = raw.select(col("k"), col("__bucket")).distinct()
      .groupBy("k").count().filter(col("count") > 1).count()
    assert(dup == 0, "bootstrap must preserve existing key→bucket mapping")
  }

  test("partitioned table: the assigner probes only the touched partition's sidecars") {
    val psch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("p", IntegerType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), psch,
      partitionKeys = Seq("p"), primaryKeys = Seq("k", "p"),
      options = Map("sequence.field" -> "seq", "bucket" -> "-1",
        "dynamic-bucket.target-row-num" -> "20",
        "dynamic-bucket.index.ranges" -> "2",
        "dynamic-bucket.index.scope-threshold" -> "0"))
    def pdf(rows: (Long, Int, String, Long)*): DataFrame =
      spark.createDataFrame(
        rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, psch)
    // full write across 4 partitions → partition/range-scoped sidecars
    t.write(pdf((0L until 40L).map(i => (i, (i % 4).toInt, s"a$i", 1L)): _*))
    val all = indexFiles(t)
    val pToks = all.flatMap(_.split('/').find(_.startsWith("__p="))).distinct
    assert(pToks.size == 4, s"expected 4 partition scopes, got $pToks")
    // a batch touching ONE of the 4 partitions must probe only that
    // partition's index files — O(written partitions), not O(table)
    t.write(pdf((0L until 40L).filter(_ % 4 == 1)
      .map(i => (i, 1, s"b$i", 2L)): _*))
    val probed = t.lastDynProbeFiles
    assert(probed.nonEmpty && probed.size < all.size,
      s"probe must be a strict subset: ${probed.size} of ${all.size}")
    val probedToks = probed.flatMap(_.split('/').find(_.startsWith("__p="))).distinct
    assert(probedToks.size == 1, s"probe crossed partitions: $probedToks")
    // correctness: updated rows visible, buckets stable
    assert(t.read.count() == 40L)
    assert(t.read.filter(col("k") === 5L).head.getAs[String]("v") == "b5")
    val raw = t.readRaw(t.sm.latestSnapshot().map(t.sm.liveEntries).get)
    assert(raw.select(col("k"), col("__bucket")).distinct()
      .groupBy("k").count().filter(col("count") > 1).count() == 0)
  }

  test("unpartitioned table: a small batch probes only its key hash-ranges") {
    val t = create(tmp(), Map("dynamic-bucket.index.ranges" -> "8"))
    t.write(df((0L until 200L).map(i => (i, s"a$i", 1L)): _*))
    val all = indexFiles(t)
    val rToks = all.flatMap(_.split('/').find(_.startsWith("__r="))).distinct
    assert(rToks.size == 8, s"200 keys must cover all 8 ranges, got $rToks")
    t.write(df((7L, "one", 2L))) // single-key ingest
    val probed = t.lastDynProbeFiles
    assert(probed.size < all.size,
      s"single-key probe must not read the whole index: ${probed.size}/${all.size}")
    val probedR = probed.flatMap(_.split('/').find(_.startsWith("__r="))).distinct
    assert(probedR.size == 1, s"single key maps to one range, probed $probedR")
    assert(t.read.count() == 200L)
    assert(t.read.filter(col("k") === 7L).head.getString(1) == "one")
    val raw = t.readRaw(t.sm.latestSnapshot().map(t.sm.liveEntries).get)
    assert(raw.select(col("k"), col("__bucket")).distinct()
      .groupBy("k").count().filter(col("count") > 1).count() == 0)
  }

  test("scoped sidecar count never triggers rewrites: only flat deltas count") {
    // a scoped rewrite emits one file per (partition, range) — far
    // more than the compact trigger on real tables. Counting them
    // against the trigger would force a FULL index rewrite on every
    // commit, reintroducing the O(total keys) per-commit IO.
    val t = create(tmp(), Map(
      "dynamic-bucket.index.ranges" -> "8", // scoped write → up to 8 files
      "dynamic-bucket.index.compact-trigger" -> "2"))
    t.write(df((0L until 60L).map(i => (i, "a", 1L)): _*))
    val scoped = indexFiles(t)
    assert(scoped.count(_.contains("__r=")) > 2, s"setup: want >trigger scoped files")
    // next two commits must stay DELTAS (one flat file each), not
    // full rewrites of the whole index
    t.write(df((60L, "b", 1L)))
    assert(indexFiles(t).size == scoped.size + 1,
      s"commit after a scoped rewrite must append one delta")
    t.write(df((61L, "b", 1L)))
    assert(indexFiles(t).size == scoped.size + 2)
    // the third delta crosses the trigger → one rewrite, scoped again
    t.write(df((62L, "b", 1L)))
    val after = indexFiles(t)
    assert(after.forall(_.contains("__r=")), s"rewrite should re-scope: $after")
    assert(t.read.count() == 63L)
  }

  test("changing index.ranges cannot misroute keys: probes use the written pin") {
    val t = create(tmp(), Map("dynamic-bucket.index.ranges" -> "2"))
    t.write(df((0L until 40L).map(i => (i, "a", 1L)): _*))
    assert(indexFiles(t).forall(_.contains("index-dyn/r2-")),
      s"scoped dirs must pin their modulus: ${indexFiles(t)}")
    // the option changes mid-life — existing sidecars keep their r2
    // tokens, so probes MUST keep hashing with 2, not 8: a mismatch
    // would prune away an existing key's entry and split it across
    // two buckets
    t.setOption("dynamic-bucket.index.ranges", "8")
    val t2 = GraftTable.load(spark, t.path)
    t2.write(df((0L until 40L).map(i => (i, "b", 2L)): _*))
    val raw = t2.readRaw(t2.sm.latestSnapshot().map(t2.sm.liveEntries).get)
    assert(raw.select(col("k"), col("__bucket")).distinct()
      .groupBy("k").count().filter(col("count") > 1).count() == 0,
      "a pin mismatch split keys across buckets")
    assert(t2.read.count() == 40L)
    assert(t2.read.filter(col("k") === 3L).head.getString(1) == "b")
    // lookups prune with the pinned modulus too
    assert(t2.lookup(Map("k" -> 5L)).head.getString(1) == "b")
  }

  test("lookup uses the index: absent keys read zero files") {
    val t = create(tmp())
    t.write(df((0L until 25L).map(i => (i, s"v$i", 1L)): _*))
    assert(t.lookup(Map("k" -> 7L)).head.getString(1) == "v7")
    val miss = t.lookup(Map("k" -> 999L))
    assert(miss.inputFiles.isEmpty, "index-missing key must plan no data files")
    assert(miss.count() == 0)
  }

  test("GC: expiration and orphan cleanup reclaim only unreferenced sidecars") {
    val t = create(tmp(), Map("dynamic-bucket.index.compact-trigger" -> "2"))
    t.write(df((0L until 10L).map(i => (i, "a", 1L)): _*))
    t.write(df((10L until 20L).map(i => (i, "b", 1L)): _*))
    t.write(df((20L until 30L).map(i => (i, "c", 1L)): _*)) // compacts index
    val liveFiles = indexFiles(t).toSet
    // unreferenced debris in index-dyn must be cleaned, live files kept
    val debris = s"${t.path}/index-dyn/debris/junk.parquet"
    t.sm.io.writeBytes(debris, Array[Byte](1, 2, 3))
    val removed = t.removeOrphanFiles(graceMillis = -1000)
    assert(removed.exists(_.contains("junk.parquet")))
    liveFiles.foreach(f => assert(t.sm.io.exists(s"${t.path}/$f"),
      s"live index sidecar $f must survive orphan cleanup"))
    // expiring old snapshots drops their superseded index deltas
    val allEverOnDisk = t.sm.io.list(s"${t.path}/index-dyn")
    t.expireSnapshots(retain = 1)
    t.removeOrphanFiles(graceMillis = -1000)
    liveFiles.foreach(f => assert(t.sm.io.exists(s"${t.path}/$f")))
    assert(t.read.count() == 30L)
    // another upsert after GC still assigns from the index
    t.write(df((0L until 5L).map(i => (i, "z", 2L)): _*))
    assert(t.read.filter(col("k") === 2L).head.getString(1) == "z")
    assert(t.read.count() == 30L)
  }
}
