package graft

import graft.core.{ObjectStoreFileIO, SnapshotManager}
import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** The commit protocol over OBJECT-STORE semantics (conditional PUT,
  * copy+delete rename, list-after-write lag) with fault injection —
  * the non-local FileIO a 100 TB deployment actually runs on
  * (reference: paimon-filesystems + FileStoreCommitImpl's retry loop). */
class ObjectStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-os").toString + "/t"

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = true),
    StructField("seq", LongType, nullable = true)))

  private def df(rows: Seq[(Long, Long, Long)]) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, sch)

  private def osTable(opts: Map[String, String] = Map.empty,
      pk: Seq[String] = Seq.empty,
      faults: ObjectStoreFileIO.Faults = ObjectStoreFileIO.Faults())
      : (GraftTable, ObjectStoreFileIO) = {
    val dir = tmp()
    GraftTable.create(spark, dir, sch, primaryKeys = pk, options = opts)
    val io = new ObjectStoreFileIO(faults)
    (GraftTable.load(spark, dir, io), io)
  }

  test("full write/upsert/delete/compact/expire cycle over object-store IO") {
    val (t, _) = osTable(pk = Seq("k"),
      opts = Map("sequence.field" -> "seq", "bucket" -> "4"))
    t.write(df((0L until 40L).map(k => (k, 0L, 0L))))
    t.write(df((0L until 20L).map(k => (k, 1L, 1L))))
    t.delete(col("k") >= 35L)
    t.compact()
    t.expireSnapshots(retain = 1)
    val got = t.read.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ((0L until 20L).map(_ -> 1L) ++
      (20L until 35L).map(_ -> 0L)).toMap)
    assert(t.lookup(Map("k" -> 7L)).head.getLong(1) == 1L)
  }

  test("concurrent committers serialize through the conditional PUT") {
    val (t, _) = osTable()
    val writers = 6
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { i =>
      new Thread(() => {
        try t.write(df(Seq((i.toLong, i.toLong, 0L))))
        catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent writes failed: ${errors.asScala.toList}")
    assert(t.read.count() == writers.toLong)
    assert(t.sm.snapshotIds == (0L until writers.toLong))
  }

  test("a landed-but-lost conditional PUT is detected, never double-committed") {
    val (t, io) = osTable()
    t.write(df(Seq((1L, 1L, 0L))))
    // the next snapshot PUT lands but its response is lost: the commit
    // loop must recognize its OWN manifest at the contested id and
    // return it instead of re-committing the same data
    io.faults.lostPutResponses.set(1)
    t.write(df(Seq((2L, 2L, 0L))))
    assert(io.faults.lostPutResponses.get() == 0, "fault must have fired")
    assert(t.sm.snapshotIds == Seq(0L, 1L), s"double commit: ${t.sm.snapshotIds}")
    assert(t.read.count() == 2L, "rows duplicated by a phantom retry")
    // subsequent commits continue cleanly
    t.write(df(Seq((3L, 3L, 0L))))
    assert(t.read.count() == 3L && t.sm.snapshotIds.size == 3)
  }

  test("at-least-once PUT retries (duplicate PUTs) are harmless") {
    val (t, _) = osTable(pk = Seq("k"),
      opts = Map("sequence.field" -> "seq", "bucket" -> "2"),
      faults = ObjectStoreFileIO.Faults(duplicatePuts = true))
    val oracle = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val rnd = new scala.util.Random(7)
    var seq = 0L
    for (batch <- 1 to 5) {
      val ups = (1 to 20).map { _ =>
        seq += 1; (rnd.nextInt(25).toLong, rnd.nextLong(1000), seq)
      }
      ups.foreach { case (k, v, s) =>
        if (oracle.get(k).forall(_._2 < s)) oracle(k) = (v, s)
      }
      t.write(df(ups))
      if (batch % 2 == 0) t.compact()
      val got = t.read.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == oracle.toMap, s"divergence at batch $batch")
    }
  }

  test("randomized churn with intermittent lost PUT responses matches the oracle") {
    val (t, io) = osTable(pk = Seq("k"),
      opts = Map("sequence.field" -> "seq", "bucket" -> "2"))
    val oracle = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val rnd = new scala.util.Random(99)
    var seq = 0L
    for (batch <- 1 to 6) {
      // every other commit's snapshot PUT lands with its response lost
      if (batch % 2 == 0) io.faults.lostPutResponses.set(1)
      val ups = (1 to 15).map { _ =>
        seq += 1; (rnd.nextInt(20).toLong, rnd.nextLong(1000), seq)
      }
      ups.foreach { case (k, v, s) =>
        if (oracle.get(k).forall(_._2 < s)) oracle(k) = (v, s)
      }
      t.write(df(ups))
      if (batch % 3 == 0) t.compact()
      val got = t.read.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == oracle.toMap, s"divergence at batch $batch")
    }
    // the history is linear and duplicate-free despite the lost CAS
    // responses: every write landed exactly once
    val ids = t.sm.snapshotIds
    assert(ids == (0L until ids.size.toLong), s"gappy history: $ids")
    val writes = t.systemSnapshots
      .filter(col("commit_kind") === "APPEND").count()
    assert(writes == 6L, s"phantom commits: $writes writes recorded")
  }

  test("stale LIST: discovery uses the LATEST hint + point reads, not list freshness") {
    val (t, io) = osTable()
    t.write(df(Seq((1L, 1L, 0L))))
    // every object younger than an hour vanishes from LIST
    io.faults.staleListMillis.set(3600L * 1000)
    t.write(df(Seq((2L, 2L, 0L))))
    t.write(df(Seq((3L, 3L, 0L))))
    // the raw listing is stale by construction…
    assert(io.list(s"${t.path}/snapshot")
      .count(_.contains("snapshot-")) < 3, "test setup: LIST must actually lag")
    // …but discovery (hint + point reads) sees every committed object:
    // snapshot ids, the latest schema, and the rows themselves
    assert(t.sm.snapshotIds == Seq(0L, 1L, 2L))
    assert(t.sm.latestSnapshotId.contains(2L))
    assert(t.sm.latestSchema().isDefined)
    assert(t.read.count() == 3L)
    io.faults.staleListMillis.set(0L)
    assert(t.sm.snapshotIds == Seq(0L, 1L, 2L))
  }

  test("rename is copy+delete; a crash between them leaves no ambiguity") {
    val io = new ObjectStoreFileIO()
    val dir = Files.createTempDirectory("graft-os-rn").toString
    io.writeString(s"$dir/a", "payload")
    io.faults.failRenameDeletes.set(1)
    val e = intercept[java.io.IOException](io.rename(s"$dir/a", s"$dir/b"))
    assert(e.getMessage.contains("crashed before delete"))
    // the copy LANDED; the source lingers (orphan — cleanup's job)
    assert(io.readString(s"$dir/b") == "payload")
    assert(io.exists(s"$dir/a"))
    // a retry of the same rename is idempotent and completes
    io.rename(s"$dir/a", s"$dir/b")
    assert(!io.exists(s"$dir/a") && io.readString(s"$dir/b") == "payload")
  }

  test("snapshot CAS at the SnapshotManager level: conditional PUT races") {
    val dir = tmp()
    GraftTable.create(spark, dir, sch)
    val io = new ObjectStoreFileIO()
    // two managers (two writers) race the same snapshot id directly
    val a = new SnapshotManager(dir, io = io)
    val b = new SnapshotManager(dir, io = io)
    val idA = a.commit(Seq.empty, graft.core.Meta.KindAppend, 0L)
    val idB = b.commit(Seq.empty, graft.core.Meta.KindAppend, 0L)
    assert(idA == 0L && idB == 1L, s"CAS must serialize: $idA, $idB")
    assert(a.latestSnapshotId.contains(1L) && b.latestSnapshotId.contains(1L))
  }
}
