package graft

import graft.streaming.GraftStreaming
import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

case class Ev(k: Long, v: String, seq: Long)

/** Streaming integration: Structured Streaming sink with exactly-once
  * epoch commits, watermark persistence, and checkpointed changelog
  * consumption. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-stream").toString

  private val evSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("seq", LongType, nullable = true)))

  test("structured streaming sink: micro-batches commit as snapshots, upserts merge") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, s"$dir/t", evSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(GraftStreaming.sink(t, watermarkColumn = Some("seq")))
      .start()
    mem.addData(Ev(1, "a1", 1), Ev(2, "b1", 1))
    q.processAllAvailable()
    mem.addData(Ev(1, "a2", 2), Ev(3, "c1", 1))
    q.processAllAvailable()
    q.stop()
    val got = t.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2"), (2L, "b1"), (3L, "c1")))
    // watermark persisted on the last snapshot
    assert(t.sm.latestSnapshot().get.watermark.contains(2L))
    assert(t.systemSnapshots.count() >= 2)
  }

  test("epoch replay is exactly-once (idempotent commitIdentifier)") {
    import scala.jdk.CollectionConverters._
    val t = GraftTable.create(spark, tmp() + "/t", evSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    val sink = GraftStreaming.sink(t)
    val batch = spark.createDataFrame(
      Seq(Row(1L, "a", 1L)).asJava, evSchema)
    sink(batch, 0L)
    sink(batch, 0L) // replayed epoch after a simulated restart
    assert(t.systemSnapshots.count() == 1)
    assert(t.read.count() == 1)
  }

  test("changelog consumption: per-snapshot deltas with durable offset") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val t = GraftTable.create(spark, s"$dir/t", evSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    def df(rows: (Long, String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, evSchema)
    t.write(df((1L, "a", 1L)))
    t.write(df((2L, "b", 1L)))

    var seen = Vector.empty[(Long, Long, String)] // (snapshot, key, kind)
    def proc(d: org.apache.spark.sql.DataFrame, id: Long): Unit =
      seen ++= d.select("k", "_row_kind").collect()
        .map(r => (id, r.getLong(0), r.getString(1)))

    val ckpt = s"$dir/offset"
    assert(GraftStreaming.processChangelog(t, ckpt, proc) == Seq(0L, 1L))
    // nothing new → no work
    assert(GraftStreaming.processChangelog(t, ckpt, proc).isEmpty)
    // new delete flows as -D; compaction snapshots are skipped
    t.delete(col("k") === 1L)
    t.compact()
    assert(GraftStreaming.processChangelog(t, ckpt, proc) == Seq(2L, 3L))
    assert(seen == Vector(
      (0L, 1L, "+I"), (1L, 2L, "+I"), (2L, 1L, "-D")))
  }

  test("streaming-read-overwrite: PK overwrite streams -D for replaced rows " +
    "and +I for the new content; =false skips the overwrite snapshot") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val pSchema = StructType(Seq(
      StructField("p", StringType, nullable = false),
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    def df(t: GraftTable, rows: (String, Long, String)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, pSchema)
    val t = GraftTable.create(spark, s"$dir/t", pSchema,
      partitionKeys = Seq("p"), primaryKeys = Seq("p", "k"))
    t.write(df(t, ("a", 1L, "x"), ("a", 2L, "y"), ("b", 3L, "z")))
    var seen = Vector.empty[(Long, Long, String, String)]
    def proc(d: org.apache.spark.sql.DataFrame, id: Long): Unit =
      seen ++= d.select("k", "v", "_row_kind").collect()
        .map(r => (id, r.getLong(0), r.getString(1), r.getString(2)))
    val ckpt = s"$dir/off"
    GraftStreaming.processChangelog(t, ckpt, proc)
    seen = Vector.empty
    // dynamic overwrite of partition a: k=1 replaced, k=2 dropped
    t.overwrite(df(t, ("a", 1L, "x2")))
    GraftStreaming.processChangelog(t, ckpt, proc)
    val byKind = seen.groupBy(_._4).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(byKind.get("-D").contains(Set((1L, "x"), (2L, "y"))),
      s"replaced rows must retract: $seen")
    assert(byKind.get("+I").contains(Set((1L, "x2"))), s"new content must insert: $seen")
    // untouched partition b never appears
    assert(!seen.exists(_._2 == 3L), s"partition b leaked into the diff: $seen")
    // explicit false: the reference's default — overwrites are skipped
    val t2 = GraftTable.create(spark, s"$dir/t2", pSchema,
      partitionKeys = Seq("p"), primaryKeys = Seq("p", "k"),
      options = Map("streaming-read-overwrite" -> "false"))
    t2.write(df(t2, ("a", 1L, "x")))
    var seen2 = Vector.empty[Long]
    val ckpt2 = s"$dir/off2"
    GraftStreaming.processChangelog(t2, ckpt2, (_, id) => seen2 :+= id)
    t2.overwrite(df(t2, ("a", 1L, "x2")))
    val drained = GraftStreaming.processChangelog(t2, ckpt2,
      (d, id) => { seen2 :+= id; assert(d.count() == 0 || false, "must not emit") })
    assert(drained.nonEmpty && seen2 == Vector(0L), // offset advanced, no batch
      s"overwrite must be skipped but offset advance: $seen2 / $drained")
  }

  test("startup modes: Latest skips history, LatestFull emits initial load, FromSnapshot replays") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val t = GraftTable.create(spark, s"$dir/t", evSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    def df(rows: (Long, String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, evSchema)
    t.write(df((1L, "a", 1L)))
    t.write(df((2L, "b", 1L)))

    var latestSeen = Vector.empty[Long]
    GraftStreaming.startChangelog(t, s"$dir/ck-latest", GraftStreaming.Latest,
      (d, id) => latestSeen :+= id)
    assert(latestSeen.isEmpty) // history skipped
    t.write(df((3L, "c", 1L)))
    GraftStreaming.startChangelog(t, s"$dir/ck-latest", GraftStreaming.Latest,
      (d, id) => latestSeen :+= id)
    assert(latestSeen == Vector(2L)) // only the new snapshot

    var fullRows = 0L
    GraftStreaming.startChangelog(t, s"$dir/ck-full", GraftStreaming.LatestFull,
      (d, id) => fullRows += d.count())
    assert(fullRows == 3L) // initial full load

    var replayed = Vector.empty[Long]
    GraftStreaming.startChangelog(t, s"$dir/ck-from", GraftStreaming.FromSnapshot(1L),
      (d, id) => replayed :+= id)
    assert(replayed == Vector(1L, 2L))

    // CompactedFull: initial batch = the state AT the latest compact
    // snapshot, then only post-compact increments
    t.compact() // snapshot 3 (COMPACT) holding the merged 3-row state
    t.write(df((4L, "d", 1L)))
    var cfBatches = Vector.empty[(Long, Long)] // (snapshot id, rows)
    GraftStreaming.startChangelog(t, s"$dir/ck-cf", GraftStreaming.CompactedFull,
      (d, id) => cfBatches :+= (id -> d.count()))
    assert(cfBatches == Vector(3L -> 3L, 4L -> 1L), s"got $cfBatches")
    // no compaction yet → degrades to LatestFull
    val t2 = GraftTable.create(spark, s"$dir/t2", evSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t2.write(df((1L, "a", 1L)))
    var cf2 = 0L
    GraftStreaming.startChangelog(t2, s"$dir/ck-cf2", GraftStreaming.CompactedFull,
      (d, _) => cf2 += d.count())
    assert(cf2 == 1L)
  }

  test("changelog-producer=lookup persists exact -U/+U pairs at write time") {
    import scala.jdk.CollectionConverters._
    val t = GraftTable.create(spark, tmp() + "/t", evSchema,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq",
        "changelog-producer" -> "lookup", "bucket" -> "2"))
    def df(rows: (Long, String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, evSchema)
    t.write(df((1L, "a", 1L), (2L, "b", 1L)))
    t.write(df((1L, "a2", 2L), (3L, "c", 1L)))   // update k=1, insert k=3
    t.delete(col("k") === 2L)                     // -D via changelog too
    // the snapshots carry persisted changelog manifests
    assert(t.sm.snapshot(1L).changelogManifest.isDefined)
    // the incremental read serves exact -U/+U pairs, with OLD values
    val chg = t.incrementalRead(0L, 1L)
      .select("k", "v", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(chg == Set((1L, "a", "-U"), (1L, "a2", "+U"), (3L, "c", "+I")))
    val del = t.incrementalRead(1L, 2L)
      .select("k", "v", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(del == Set((2L, "b", "-D")))
    // an identical re-upsert leaves the state unchanged → no changelog
    // rows (diff-based dedup; the reference needs
    // changelog-producer.row-deduplicate for this)
    t.write(df((3L, "c", 1L)))
    assert(t.incrementalRead(2L, 3L).count() == 0)
    // table content unaffected by the producer
    val got = t.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2"), (3L, "c")))
  }

  test("changelog files expire with their snapshots; kept ones survive") {
    import scala.jdk.CollectionConverters._
    val t = GraftTable.create(spark, tmp() + "/t", evSchema,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq",
        "changelog-producer" -> "lookup", "bucket" -> "1"))
    def df(rows: (Long, String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, evSchema)
    (1 to 5).foreach(i => t.write(df((i.toLong, s"v$i", 1L))))
    def clFiles(): Set[String] = {
      val p = java.nio.file.Paths.get(s"${t.path}/changelog")
      if (!java.nio.file.Files.isDirectory(p)) Set.empty
      else java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_)).map(_.toString)
        .filter(_.endsWith(".parquet")).toSet
    }
    val before = clFiles()
    assert(before.nonEmpty)
    t.expireSnapshots(retain = 2)
    val after = clFiles()
    assert(after.size < before.size, "dropped snapshots' changelog must be reclaimed")
    // surviving snapshots still serve their persisted changelog
    assert(t.incrementalRead(3L, 4L)
      .select("k", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((5L, "+I")))
    // orphan cleanup may sweep _SUCCESS/.crc debris but never touches
    // referenced changelog parquet
    assert(t.removeOrphanFiles(graceMillis = -1000)
      .forall(f => !f.endsWith(".parquet")))
    assert(clFiles() == after)
  }

  test("a tag protects its changelog FILES from expiration; rollback reclaims them") {
    import scala.jdk.CollectionConverters._
    val t = GraftTable.create(spark, tmp() + "/t", evSchema,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq",
        "changelog-producer" -> "lookup", "bucket" -> "1"))
    def df(rows: (Long, String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, evSchema)
    (1 to 3).foreach(i => t.write(df((i.toLong, s"v$i", 1L))))
    // tag the CURRENT snapshot (carries a changelog manifest), then
    // commit + expire past it: protecting only the tag's changelog
    // MANIFEST while deleting the files it lists would break the
    // tag's changelog read with file-not-found
    t.createTag("early")
    (4 to 6).foreach(i => t.write(df((i.toLong, s"v$i", 1L))))
    val tagged = t.sm.tagSnapshots.find(_ => true).get
    val taggedClFiles = tagged.changelogManifest.toSeq
      .flatMap(t.sm.readManifest).map(_.file.fileName)
    assert(taggedClFiles.nonEmpty, "tagged snapshot must carry changelog")
    t.expireSnapshots(retain = 1)
    taggedClFiles.foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"${t.path}/$f")),
        s"tagged changelog file $f must survive expiration")
    }
    // rollback deletes the rolled-back snapshots' changelog FILES with
    // their manifests — once the manifest is gone nothing could ever
    // enumerate them again (they'd leak as permanent orphans)
    val t2 = GraftTable.create(spark, tmp() + "/t2", evSchema,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq",
        "changelog-producer" -> "lookup", "bucket" -> "1"))
    (1 to 4).foreach(i => t2.write(df((i.toLong, s"v$i", 1L))))
    val lastCl = t2.sm.latestSnapshot().get.changelogManifest.toSeq
      .flatMap(t2.sm.readManifest).map(_.file.fileName)
    assert(lastCl.nonEmpty)
    t2.sm.rollbackTo(t2.sm.latestSnapshotId.get - 2)
    lastCl.foreach { f =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"${t2.path}/$f")),
        s"rolled-back changelog file $f must be reclaimed, not orphaned")
    }
    // the surviving history still reads
    assert(t2.read.count() == 2)
  }

  test("epoch dedup is scoped by app id: two queries' epoch 0 both land") {
    import scala.jdk.CollectionConverters._
    val path = tmp() + "/t"
    val tA = GraftTable.create(spark, path, evSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    val sinkA = GraftStreaming.sink(tA, appId = Some("etl-a"))
    sinkA(spark.createDataFrame(Seq(Row(1L, "a", 1L)).asJava, evSchema), 0L)
    // a SECOND query (own table handle, own epoch counter starting at
    // 0) — identifier-only dedup would silently swallow this batch
    val tB = GraftTable.load(spark, path)
    val sinkB = GraftStreaming.sink(tB, appId = Some("etl-b"))
    sinkB(spark.createDataFrame(Seq(Row(2L, "b", 1L)).asJava, evSchema), 0L)
    assert(tA.read.count() == 2, "distinct apps' epoch 0 must both commit")
    // replay within one app still dedups — including across a RESTART
    // (fresh table handle, same app id)
    val tA2 = GraftTable.load(spark, path)
    val sinkA2 = GraftStreaming.sink(tA2, appId = Some("etl-a"))
    sinkA2(spark.createDataFrame(Seq(Row(1L, "a", 1L)).asJava, evSchema), 0L)
    assert(tA2.read.count() == 2)
    assert(tA2.systemSnapshots.count() == 2)
  }

  test("bounded stream stops at the watermark bound") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val t = GraftTable.create(spark, s"$dir/t", evSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    def df(rows: (Long, String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, evSchema)
    val sink = GraftStreaming.sink(t, watermarkColumn = Some("seq"))
    sink(df((1L, "a", 5L)), 0L)   // watermark 5
    sink(df((2L, "b", 10L)), 1L)  // watermark 10
    sink(df((3L, "c", 20L)), 2L)  // watermark 20 — beyond the bound
    var seen = Vector.empty[Long]
    val (p1, done1) = GraftStreaming.processChangelogBounded(t, s"$dir/ck",
      boundedWatermark = 10L, (_, id) => seen :+= id)
    assert(seen == Vector(0L, 1L), s"snapshots past the bound must not process: $seen")
    assert(p1 == Seq(0L, 1L) && done1, "bound reached → stream complete")
    // the out-of-bound snapshot was NOT consumed: a re-drain with the
    // same bound stays put, a raised bound picks it up exactly once
    val (p2, done2) = GraftStreaming.processChangelogBounded(t, s"$dir/ck",
      boundedWatermark = 10L, (_, id) => seen :+= id)
    assert(p2.isEmpty && done2)
    val (p3, done3) = GraftStreaming.processChangelogBounded(t, s"$dir/ck",
      boundedWatermark = 25L, (_, id) => seen :+= id)
    assert(p3 == Seq(2L) && !done3)
    assert(seen == Vector(0L, 1L, 2L))
  }

  test("bucket function matches the writer's bucketing; max_pt answers from manifests") {
    import scala.jdk.CollectionConverters._
    import graft.functions.TableFunctions
    val sch = StructType(Seq(
      StructField("dt", StringType, nullable = false),
      StructField("k", LongType, nullable = false),
      StructField("seq", LongType, nullable = true)))
    def df(rows: (String, Long, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, sch)
    val t = GraftTable.create(spark, tmp() + "/t", sch,
      partitionKeys = Seq("dt"), primaryKeys = Seq("dt", "k"),
      options = Map("sequence.field" -> "seq", "bucket" -> "4"))
    t.write(df(("2024-01-01", 1L, 1L), ("2024-02-01", 2L, 1L)))
    // bucket() reproduces the physical bucket of every written row
    val withBucket = t.readRaw(t.sm.latestSnapshot().map(t.sm.liveEntries).get)
      .withColumn("calc", TableFunctions.bucket(4, col("dt"), col("k")))
    assert(withBucket.filter(col("calc") =!= col("__bucket")).count() == 0)
    // max_pt: latest non-empty partition, manifests only
    assert(TableFunctions.maxPt(t, "dt").contains("2024-02-01"))
    // append table: a metadata-only partition drop moves max_pt back
    val sch2 = StructType(sch.fields.filterNot(_.name == "seq"))
    val a = GraftTable.create(spark, tmp() + "/a", sch2, partitionKeys = Seq("dt"))
    a.write(spark.createDataFrame(
      Seq(Row("2024-01-01", 1L), Row("2024-02-01", 2L)).asJava, sch2))
    assert(TableFunctions.maxPt(a, "dt").contains("2024-02-01"))
    a.delete(col("dt") === "2024-02-01")
    assert(TableFunctions.maxPt(a, "dt").contains("2024-01-01"))
  }

  test("max_pt compares in the partition column's declared order, not " +
    "directory-string order; null partitions never win; escapes decode") {
    import scala.jdk.CollectionConverters._
    import graft.functions.TableFunctions
    // INT partition: 9 vs 10 — lexicographic says "9", typed says 10
    val si = StructType(Seq(
      StructField("h", IntegerType, nullable = true),
      StructField("v", LongType, nullable = false)))
    val ti = GraftTable.create(spark, tmp() + "/ti", si, partitionKeys = Seq("h"))
    ti.write(spark.createDataFrame(
      Seq(Row(9, 1L), Row(10, 2L), Row(null, 3L)).asJava, si))
    assert(TableFunctions.maxPt(ti, "h").contains("10"),
      s"typed max_pt broken: ${TableFunctions.maxPt(ti, "h")}")
    // string partition with Hive-escaped characters: the DISPLAY value
    // returns, and the null partition still never wins
    val ss = StructType(Seq(
      StructField("p", StringType, nullable = true),
      StructField("v", LongType, nullable = false)))
    val ts = GraftTable.create(spark, tmp() + "/ts", ss, partitionKeys = Seq("p"))
    ts.write(spark.createDataFrame(
      Seq(Row("a:b", 1L), Row("a:a", 2L), Row(null, 3L)).asJava, ss))
    assert(TableFunctions.maxPt(ts, "p").contains("a:b"))
    // only the null partition holds rows -> None
    val tn = GraftTable.create(spark, tmp() + "/tn", ss, partitionKeys = Seq("p"))
    tn.write(spark.createDataFrame(Seq(Row(null, 1L)).asJava, ss))
    assert(TableFunctions.maxPt(tn, "p").isEmpty)
  }

  test("stream-static lookup join re-resolves the dim snapshot per epoch") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val dim = GraftTable.create(spark, s"$dir/dim", StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("name", StringType, nullable = true))),
      primaryKeys = Seq("k"))
    dim.write(spark.createDataFrame(Seq(Row(1L, "one")).asJava, dim.schema.toStruct))
    val batch = spark.createDataFrame(
      Seq(Row(1L, "x", 1L), Row(2L, "y", 1L)).asJava, evSchema)
    val j1 = GraftStreaming.lookupJoin(batch, dim, Seq("k"))
      .select("k", "name").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(j1 == Map(1L -> Some("one"), 2L -> None))
    // dim refreshed between epochs → next batch sees the new row
    dim.write(spark.createDataFrame(Seq(Row(2L, "two")).asJava, dim.schema.toStruct))
    val j2 = GraftStreaming.lookupJoin(batch, dim, Seq("k"))
      .select("k", "name").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(j2 == Map(1L -> Some("one"), 2L -> Some("two")))
  }

  test("partial lookup join scans only the probed buckets") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val dimSch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val dim = GraftTable.create(spark, s"$dir/dim", dimSch,
      primaryKeys = Seq("k"), options = Map("bucket" -> "8"))
    dim.write(spark.createDataFrame(
      (0L until 64L).map(i => Row(i, s"n$i")).asJava, dimSch))
    val allDimFiles = dim.read.inputFiles.toSet
    assert(allDimFiles.size >= 8, s"want >=8 dim files, got ${allDimFiles.size}")

    // a 2-key epoch probes at most 2 of the 8 buckets
    val batchSch = StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val batch = spark.createDataFrame(
      Seq(Row(3L, "a"), Row(17L, "b")).asJava, batchSch)
    val joined = GraftStreaming.lookupJoin(batch, dim, Seq("k"))
    assert(joined.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(2))).toSeq == Seq((3L, "n3"), (17L, "n17")))
    // plan-leaf evidence: the join's only file inputs are the probed
    // buckets' dim files — a strict subset of the dim table's files
    // (the reference's partial lookup resolves only the probed keys,
    // PrimaryKeyPartialLookupTable.java:60)
    val scanned = joined.inputFiles.toSet
    assert(scanned.nonEmpty && scanned.subsetOf(allDimFiles), scanned.toString)
    assert(scanned.size < allDimFiles.size,
      s"partial lookup scanned ALL ${allDimFiles.size} dim files")
    val st = GraftStreaming.lastLookupStats.get
    assert(st.mode == "partial" && st.entriesScanned < st.entriesTotal, st.toString)
  }

  test("lookup join broadcast threshold is byte-based: wide slices shuffle") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val dimSch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("payload", StringType, nullable = true)))
    val dim = GraftTable.create(spark, s"$dir/dim", dimSch,
      primaryKeys = Seq("k"), options = Map("bucket" -> "2"))
    // few rows (far below any row-count threshold) but WIDE: the byte
    // estimate from manifest fileSize must veto the broadcast
    dim.write(spark.createDataFrame(
      (0L until 50L).map(i => Row(i, scala.util.Random.nextString(2000))).asJava,
      dimSch))
    val batchSch = StructType(Seq(StructField("k", LongType, nullable = false)))
    val batch = spark.createDataFrame(Seq(Row(3L), Row(7L)).asJava, batchSch)
    val joined = GraftStreaming.lookupJoin(batch, dim, Seq("k"),
      maxBroadcastBytes = 10 * 1024)
    assert(joined.count() == 2)
    val st = GraftStreaming.lastLookupStats.get
    assert(st.mode == "partial" && !st.broadcastSide,
      s"wide slice must take the shuffle path: $st")
    // same dim under the default byte budget: small enough → broadcast
    GraftStreaming.lookupJoin(batch, dim, Seq("k")).count()
    assert(GraftStreaming.lastLookupStats.get.broadcastSide)
  }

  test("partial lookup join on a dynamic-bucket dim resolves buckets via the key index") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val dimSch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    // bucket=-1: a key's bucket is index-assigned, not hash-derivable —
    // the partial path must consult the persisted dynamic-bucket index
    val dim = GraftTable.create(spark, s"$dir/dim", dimSch,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "-1", "dynamic-bucket.target-row-num" -> "16"))
    dim.write(spark.createDataFrame(
      (0L until 64L).map(i => Row(i, s"n$i")).asJava, dimSch))
    val allDimFiles = dim.read.inputFiles.toSet
    assert(allDimFiles.size >= 2, s"want multiple dyn buckets, got ${allDimFiles.size}")
    val batchSch = StructType(Seq(StructField("k", LongType, nullable = false)))
    val batch = spark.createDataFrame(Seq(Row(5L)).asJava, batchSch)
    val joined = GraftStreaming.lookupJoin(batch, dim, Seq("k"))
    assert(joined.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((5L, "n5")))
    val scanned = joined.inputFiles.toSet
    // the index resolves key 5's single bucket: strictly fewer files
    assert(scanned.nonEmpty && scanned.subsetOf(allDimFiles))
    assert(scanned.size < allDimFiles.size,
      s"dynamic partial lookup scanned ALL ${allDimFiles.size} files")
    val st = GraftStreaming.lastLookupStats.get
    assert(st.mode == "partial" && st.entriesScanned < st.entriesTotal, st.toString)
  }

  test("full lookup join reuses the resolved dim while its snapshot is unchanged") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    // append-only dim (no PK): keys can't bucket-prune → full mode
    val dimSch = StructType(Seq(
      StructField("code", StringType, nullable = false),
      StructField("label", StringType, nullable = true)))
    val dim = GraftTable.create(spark, s"$dir/dim", dimSch)
    dim.write(spark.createDataFrame(Seq(Row("a", "Alpha")).asJava, dimSch))
    GraftStreaming.invalidateLookupCache(dim)
    val batchSch = StructType(Seq(StructField("code", StringType, nullable = false)))
    val batch = spark.createDataFrame(Seq(Row("a"), Row("b")).asJava, batchSch)

    def run() = GraftStreaming.lookupJoin(batch, dim, Seq("code"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(run() == Map("a" -> Some("Alpha"), "b" -> None))
    val first = GraftStreaming.lastLookupStats.get
    assert(first.mode == "full" && !first.cacheHit, first.toString)
    // same snapshot → the resolved dim content is served from cache
    assert(run() == Map("a" -> Some("Alpha"), "b" -> None))
    val second = GraftStreaming.lastLookupStats.get
    assert(second.cacheHit, second.toString)
    // a new dim snapshot invalidates the cache and is visible at once
    dim.write(spark.createDataFrame(Seq(Row("b", "Beta")).asJava, dimSch))
    assert(run() == Map("a" -> Some("Alpha"), "b" -> Some("Beta")))
    val third = GraftStreaming.lastLookupStats.get
    assert(!third.cacheHit, third.toString)
    GraftStreaming.invalidateLookupCache(dim)
  }

  test("full-compaction changelogs reach streaming consumers; Latest subscribes on empty tables") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val t = GraftTable.create(spark, s"$dir/t", evSchema,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq",
        "changelog-producer" -> "full-compaction", "bucket" -> "1"))
    def df(rows: (Long, String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, evSchema)
    t.write(df((1L, "a", 1L)))
    t.compact() // changelog attaches to the COMPACT snapshot
    t.write(df((1L, "a2", 2L), (2L, "b", 1L)))
    t.compact()
    var got = Vector.empty[(Long, String)]
    GraftStreaming.processChangelog(t, s"$dir/cp", (d, _) =>
      got ++= d.select("k", "_row_kind").collect()
        .map(r => (r.getLong(0), r.getString(1))))
    // the exact diff of BOTH compactions must arrive — a consumer that
    // skips COMPACT snapshots unconditionally receives nothing while
    // its offset still advances (permanent silent data loss)
    assert(got.nonEmpty, "full-compaction changelog must reach the consumer")
    assert(got.contains((2L, "+I")), got.toString)
    assert(got.exists(r => r._1 == 1L && (r._2 == "+U" || r._2 == "+I")), got.toString)

    // Latest on an EMPTY table records the subscription point: later
    // commits must be delivered, not skipped by a re-initialization
    val t2 = GraftTable.create(spark, s"$dir/t2", evSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    GraftStreaming.startChangelog(t2, s"$dir/cp2", GraftStreaming.Latest,
      (_, _) => ())
    t2.write(df((9L, "z", 1L)))
    var ids = Vector.empty[Long]
    GraftStreaming.startChangelog(t2, s"$dir/cp2", GraftStreaming.Latest,
      (_, id) => ids :+= id)
    assert(ids == Vector(0L),
      s"snapshots after an empty-table subscription must deliver: $ids")
  }

  test("the consumer.ignore-progress TABLE OPTION applies once per consumer") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val sch = StructType(Seq(StructField("k", LongType, nullable = false)))
    def df(v: Long) = spark.createDataFrame(Seq(Row(v)).asJava, sch)
    val t = GraftTable.create(spark, s"$dir/t", sch,
      options = Map("consumer.ignore-progress" -> "true"))
    t.write(df(1L)); t.write(df(2L))
    val cp = s"$dir/cp"
    var seen = Vector.empty[Long]
    GraftStreaming.startChangelog(t, cp, GraftStreaming.FromSnapshot(0L),
      (_, id) => seen :+= id)
    assert(seen == Vector(0L, 1L))
    // a second drain under the SAME consumer must NOT re-position —
    // per-call re-positioning would replay (or skip) between drains
    t.write(df(3L))
    seen = Vector.empty
    GraftStreaming.startChangelog(t, cp, GraftStreaming.FromSnapshot(0L),
      (_, id) => seen :+= id)
    assert(seen == Vector(2L),
      s"second drain must continue from progress, got $seen")
  }

  test("consumer.ignore-progress re-positions from the startup mode") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val sch = StructType(Seq(StructField("k", LongType, nullable = false)))
    def df(v: Long) = spark.createDataFrame(Seq(Row(v)).asJava, sch)
    val t = GraftTable.create(spark, s"$dir/t", sch)
    t.write(df(1L)); t.write(df(2L)); t.write(df(3L))
    val cp = s"$dir/cp"
    var seen = Vector.empty[Long]
    GraftStreaming.startChangelog(t, cp, GraftStreaming.FromSnapshot(0L),
      (_, id) => seen :+= id)
    assert(seen == Vector(0L, 1L, 2L))
    // stored progress normally wins: nothing new to drain
    seen = Vector.empty
    GraftStreaming.startChangelog(t, cp, GraftStreaming.FromSnapshot(0L),
      (_, id) => seen :+= id)
    assert(seen.isEmpty)
    // ignoreProgress re-initializes from the mode and REPLAYS
    seen = Vector.empty
    GraftStreaming.startChangelog(t, cp, GraftStreaming.FromSnapshot(1L),
      (_, id) => seen :+= id, ignoreProgress = true)
    assert(seen == Vector(1L, 2L), seen.toString)
    // progress keeps committing under the same consumer afterwards
    t.write(df(4L))
    seen = Vector.empty
    GraftStreaming.startChangelog(t, cp, GraftStreaming.FromSnapshot(1L),
      (_, id) => seen :+= id)
    assert(seen == Vector(3L))
  }

  test("full lookup cache never serves main's rows for a branch dim (or vice versa)") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val dimSch = StructType(Seq(
      StructField("code", StringType, nullable = false),
      StructField("label", StringType, nullable = true)))
    val dim = GraftTable.create(spark, s"$dir/dim", dimSch)
    dim.write(spark.createDataFrame(Seq(Row("a", "fork")).asJava, dimSch))
    dim.createBranch("b")
    val branch = dim.branchTable("b")
    // both heads advance to snapshot id 2 with DIFFERENT content —
    // same path, coinciding ids: the classic cache-collision shape
    dim.overwrite(spark.createDataFrame(Seq(Row("a", "main")).asJava, dimSch))
    branch.overwrite(spark.createDataFrame(Seq(Row("a", "branch")).asJava, dimSch))
    assert(dim.sm.latestSnapshotId == branch.sm.latestSnapshotId)
    GraftStreaming.invalidateLookupCache(dim)
    GraftStreaming.invalidateLookupCache(branch)
    val batchSch = StructType(Seq(StructField("code", StringType, nullable = false)))
    val batch = spark.createDataFrame(Seq(Row("a")).asJava, batchSch)
    def label(d: GraftTable) = GraftStreaming.lookupJoin(batch, d, Seq("code"))
      .collect().map(_.getString(1)).toSeq
    assert(label(dim) == Seq("main"))
    assert(label(branch) == Seq("branch")) // must NOT hit main's cache entry
    assert(label(dim) == Seq("main"))      // nor the branch's
    GraftStreaming.invalidateLookupCache(dim)
    GraftStreaming.invalidateLookupCache(branch)
  }

  test("consumer-id + compacted-full + snapshot expiry compose: paced drain, " +
    "checkpointed restart, retention pinned at the consumer offset") {
    spark.conf.set("spark.sql.catalog.graftcc", "graft.sources.GraftCatalog")
    val wh = Files.createTempDirectory("graft-cc-wh").toString
    spark.conf.set("spark.sql.catalog.graftcc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcc.d")
    spark.sql("CREATE TABLE graftcc.d.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'scan.max-rows-per-trigger'='2')")
    spark.sql("INSERT INTO graftcc.d.t VALUES (1,'a'),(2,'b')")   // s0
    spark.sql("INSERT INTO graftcc.d.t VALUES (1,'a2')")          // s1
    val gt = GraftTable.load(spark, s"$wh/d/t")
    gt.compact()                                                  // s2 COMPACT
    spark.sql("INSERT INTO graftcc.d.t VALUES (3,'c')")           // s3
    spark.sql("INSERT INTO graftcc.d.t VALUES (4,'d')")           // s4

    def drain(ck: String): Seq[(Long, String)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
      val q = spark.readStream
        .option("consumer-id", "cc")
        .option("scan.mode", "compacted-full")
        .table("graftcc.d.t").writeStream
        .option("checkpointLocation", ck)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => got.add((r.getLong(0), r.getString(1)))): Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq
    }
    // drain 1: full state AT the compact snapshot, then the two deltas —
    // pacing (max 2 rows/trigger) forces >=3 batches, so Spark
    // checkpoints (and the mirror flushes) mid-drain
    val ck1 = Files.createTempDirectory("graft-cc-ck").toString
    val first = drain(ck1)
    assert(first.sorted == Seq((1L, "a2"), (2L, "b"), (3L, "c"), (4L, "d")),
      s"compacted-full drain must skip pre-compact churn: $first")
    // the mirror trails by one run: progress, when flushed, never
    // passes the checkpoint
    val off1 = GraftStreaming.consumerOffset(gt, "cc")
    assert(off1.forall(o => o >= 2L && o <= 4L), s"offset after drain1: $off1")

    // restart from the SAME checkpoint: only new commits arrive — the
    // full-start marker never replays
    spark.sql("INSERT INTO graftcc.d.t VALUES (5,'e')")           // s5
    assert(drain(ck1) == Seq((5L, "e")))
    // drain 2 flushes drain 1's committed progress (the trail is safe:
    // never pins less than the compact snapshot)
    val off2 = GraftStreaming.consumerOffset(gt, "cc").get
    assert(off2 >= 2L && off2 <= 5L, s"mirror after drain2: $off2")

    // expiry: retain=1 would drop everything but the tip, but the
    // registered consumer pins every snapshot PAST its offset
    gt.expireSnapshots(retain = 1)
    val left = gt.sm.snapshotIds
    assert(left.forall(_ > off2),
      s"expiry dropped only up to the consumer offset: $left vs $off2")
    assert(left.contains(5L), s"snapshots past the consumer must survive: $left")

    // a FRESH checkpoint with the same consumer-id resumes after the
    // mirrored progress over the EXPIRED history: exactly the rows of
    // snapshots past the offset — no loss, no pre-offset replay
    spark.sql("INSERT INTO graftcc.d.t VALUES (6,'f')")           // s6
    val rowOf = Map(3L -> (3L, "c"), 4L -> (4L, "d"),
      5L -> (5L, "e"), 6L -> (6L, "f"))
    val resumed = drain(Files.createTempDirectory("graft-cc-ck2").toString)
    val expected = ((off2 + 1) to 6L).flatMap(rowOf.get)
    assert(resumed.sorted == expected.sorted,
      s"fresh-checkpoint resume must serve exactly post-offset rows: " +
        s"$resumed vs $expected (offset $off2)")
  }
}
