package graft

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Robustness: concurrent commit CAS races and a randomized
  * write/read-back oracle (the reference's TestKeyValueGenerator +
  * TestFileStore pattern — random KeyValue streams checked against an
  * in-memory map). */
class RobustnessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-robust").toString + "/t"

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = true),
    StructField("seq", LongType, nullable = true)))

  private def df(rows: Seq[(Long, Long, Long)]) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, sch)

  test("tryCreateAtomic never exposes a visible-but-torn file to readers") {
    // Regression for the 4-way commit race: CREATE_NEW + write makes
    // the path visible EMPTY before content lands, so a concurrent
    // exists()→readString() parsed torn snapshot JSON. The hard-link
    // CAS must publish full content or nothing.
    val dir = Files.createTempDirectory("graft-cas").toString
    val io = new graft.core.LocalFileIO
    val payload = "x" * 65536
    val n = 300
    @volatile var torn: Option[String] = None
    @volatile var writing = true
    val reader = new Thread(() => {
      var i = 0
      while (writing && torn.isEmpty) {
        val path = s"$dir/f-${i % n}.json"
        if (io.exists(path)) {
          val got = io.readString(path)
          if (got.length != payload.length) torn = Some(s"$path: ${got.length}")
        }
        i += 1
      }
    })
    reader.start()
    (0 until n).foreach { i =>
      assert(io.tryCreateAtomic(s"$dir/f-$i.json", payload))
      // CAS contract: the second create must lose…
      assert(!io.tryCreateAtomic(s"$dir/f-$i.json", "loser"))
    }
    writing = false
    reader.join(10000)
    assert(torn.isEmpty, s"reader saw torn content: $torn")
    // …and the winner's content survives
    assert(io.readString(s"$dir/f-0.json") == payload)
  }

  test("concurrent appenders: CAS retries serialize commits, no data lost") {
    val t = GraftTable.create(spark, tmp(), sch)
    val writers = 6
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { i =>
      new Thread(() => {
        try t.write(df(Seq((i.toLong, i.toLong, 0L))))
        catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent writes failed: ${errors.asScala.toList}")
    assert(t.systemSnapshots.count() == writers.toLong)
    assert(t.read.count() == writers.toLong)
    // snapshot ids are a gapless serialized sequence
    assert(t.sm.snapshotIds == (0L until writers.toLong))
  }

  test("async snapshot expiry racing concurrent committers loses nothing") {
    val t = GraftTable.create(spark, tmp(), sch, options = Map(
      "snapshot.num-retained.max" -> "3",
      "snapshot.num-retained.min" -> "1",
      "snapshot.expire.execution-mode" -> "async"))
    val writers = 4
    val rounds = 5
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { i =>
      new Thread(() => {
        try (0 until rounds).foreach { r =>
          t.write(df(Seq(((i * rounds + r).toLong, i.toLong, r.toLong))))
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"writes failed: ${errors.asScala.toList}")
    // every committed row is readable at the tip even while retention
    // walks ran concurrently on the daemon thread
    assert(t.read.count() == (writers * rounds).toLong)
    // retention eventually bounds the history (poll: the last walk may
    // still be queued)
    val deadline = System.currentTimeMillis() + 30000
    while (t.sm.snapshotIds.size > 3 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(t.sm.snapshotIds.size <= 3, t.sm.snapshotIds.toString)
    assert(t.read.count() == (writers * rounds).toLong)
  }

  test("interleaved upserts and compactions: linear history, no lost updates") {
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "bucket" -> "4"))
    t.write(df((0L until 40L).map(k => (k, 0L, 0L))))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // 4 writers × 3 upsert commits over DISJOINT key ranges, racing a
    // compactor thread: upserts only ADD files so they never conflict;
    // compaction's victims stay live under concurrent adds, so every
    // commit must land (CAS retries serialize them)
    val writers = (0 until 4).map { i =>
      new Thread(() => {
        try (1 to 3).foreach { c =>
          t.write(df((0 until 10).map(j =>
            (i * 10L + j, c.toLong, c.toLong))))
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    val compactor = new Thread(() => {
      try (1 to 3).foreach { _ => t.compact(); Thread.sleep(50) }
      catch { case e: Throwable => errors.add(e) }
    })
    (writers :+ compactor).foreach(_.start())
    (writers :+ compactor).foreach(_.join())
    assert(errors.isEmpty, s"concurrent commits failed: ${errors.asScala.toList}")
    // linear gapless snapshot history: initial + 12 upserts + up to 3
    // compacts (a compact finding nothing to merge may no-op)
    val ids = t.sm.snapshotIds
    assert(ids == (0L until ids.size.toLong), s"gappy history: $ids")
    assert(ids.size >= 13 && ids.size <= 16, s"got ${ids.size} snapshots")
    // no lost updates: every key ends at its writer's last value
    val got = t.read.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 40L).map(_ -> 3L).toMap, got.toString)
  }

  test("delete racing delete: gone victims are rejected cleanly, retry succeeds") {
    val t = GraftTable.create(spark, tmp(), sch)
    // one file per write → k<100 live in file A, k>=100 in file B
    t.write(df((0L until 10L).map(k => (k, k, 0L))).coalesce(1))
    t.write(df((100L until 110L).map(k => (k, k, 0L))).coalesce(1))

    // disjoint victims: rewrites touch different files — both land
    val errs1 = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val d1 = new Thread(() => {
      try t.delete(col("k") === 5L) catch { case e: Throwable => errs1.add(e) } })
    val d2 = new Thread(() => {
      try t.delete(col("k") === 105L) catch { case e: Throwable => errs1.add(e) } })
    Seq(d1, d2).foreach(_.start()); Seq(d1, d2).foreach(_.join())
    assert(errs1.isEmpty, errs1.asScala.toList.toString)
    assert(t.read.count() == 18)

    // SAME victim file: the loser's planned rewrite input is gone by
    // CAS time — it must be REJECTED (commit conflict), never commit a
    // rewrite that resurrects the winner's deleted row
    val errs2 = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val d3 = new Thread(() => {
      try t.delete(col("k") === 1L) catch { case e: Throwable => errs2.add(e) } })
    val d4 = new Thread(() => {
      try t.delete(col("k") === 2L) catch { case e: Throwable => errs2.add(e) } })
    Seq(d3, d4).foreach(_.start()); Seq(d3, d4).foreach(_.join())
    val rejected = errs2.asScala.toList
    assert(rejected.forall(_.toString.contains("commit conflict")),
      rejected.toString)
    // a rejected delete re-applied against the NEW state succeeds
    if (rejected.nonEmpty) {
      val left = t.read.filter(col("k").isin(1L, 2L)).collect().map(_.getLong(0))
      assert(left.length == 1, s"winner applied exactly one delete: ${left.toSeq}")
      t.delete(col("k") === left.head)
    }
    assert(t.read.filter(col("k").isin(1L, 2L)).count() == 0)
    assert(t.read.count() == 16)
    // history stayed linear through the race
    val ids = t.sm.snapshotIds
    assert(ids == (0L until ids.size.toLong), s"gappy history: $ids")
  }

  test("conflicting compactions: loser detects deleted inputs and aborts") {
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t.write(df(Seq((1L, 1L, 1L))))
    t.write(df(Seq((1L, 2L, 2L))))
    t.compact()
    // a second compaction planned against the SAME inputs must fail its
    // conflict check (its inputs are no longer live) — simulate by
    // rolling back the metadata clock: compact again is fine normally,
    // so instead verify the guard directly
    val live = t.sm.latestSnapshot().map(t.sm.liveEntries).get
    val stale = live.map(_.copy(kind = "DELETE",
      file = live.head.file.copy(fileName = "data/no-such-file.parquet")))
    intercept[IllegalStateException] {
      t.sm.commit(stale, graft.core.Meta.KindCompact, t.schema.id,
        conflictCheck = latest => stale.map(_.file.fileName).toSet
          .subsetOf(t.sm.liveEntries(latest).map(_.file.fileName).toSet))
    }
    // table unharmed
    assert(t.read.head.getLong(1) == 2L)
  }

  test("randomized upsert/delete stream matches an in-memory oracle") {
    val rnd = new scala.util.Random(42)
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "bucket" -> "4"))
    val oracle = scala.collection.mutable.Map.empty[Long, (Long, Long)] // k -> (v, seq)
    var seq = 0L
    for (batch <- 1 to 8) {
      val ups = (1 to 30).map { _ =>
        seq += 1
        (rnd.nextInt(40).toLong, rnd.nextLong(1000000), seq)
      }
      // apply upserts (sequence-field wins ties — here seqs are unique)
      ups.foreach { case (k, v, s) =>
        if (oracle.get(k).forall(_._2 < s)) oracle(k) = (v, s)
      }
      t.write(df(ups))
      if (batch % 3 == 0) {
        val doomed = oracle.keys.toSeq.sorted.take(5)
        t.delete(col("k").isin(doomed: _*))
        doomed.foreach(oracle.remove)
      }
      if (batch % 4 == 0) t.compact()
      val got = t.read.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == oracle.toMap, s"divergence at batch $batch")
    }
    // survive expiration + one final compaction
    t.expireSnapshots(retain = 2)
    t.compact()
    val fin = t.read.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fin == oracle.toMap)
  }

  test("randomized churn with pruned predicate scans matches the oracle") {
    // same churn as above, but every batch also cross-checks PREDICATE
    // scans — stats pruning, bloom sidecars, and the global secondary
    // index all sit between the filter and the answer
    val rnd = new scala.util.Random(1234)
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "bucket" -> "4",
        GraftTable.SecIndexColumns -> "v",
        "file-index.bloom-filter.columns" -> "k"))
    val oracle = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    var seq = 0L
    for (batch <- 1 to 8) {
      val ups = (1 to 30).map { _ =>
        seq += 1
        (rnd.nextInt(40).toLong, rnd.nextLong(50), seq)
      }
      ups.foreach { case (k, v, s) =>
        if (oracle.get(k).forall(_._2 < s)) oracle(k) = (v, s)
      }
      t.write(df(ups))
      if (batch % 3 == 0) {
        val doomed = oracle.keys.toSeq.sorted.take(5)
        t.delete(col("k").isin(doomed: _*))
        doomed.foreach(oracle.remove)
      }
      if (batch % 4 == 0) t.compact()
      for (_ <- 0 until 3) {
        val (pred, keep): (org.apache.spark.sql.Column, ((Long, (Long, Long))) => Boolean) =
          rnd.nextInt(4) match {
            case 0 =>
              val k = rnd.nextInt(45).toLong
              (col("k") === k, { case (k0, _) => k0 == k })
            case 1 =>
              val v = rnd.nextInt(50).toLong
              (col("v") === v, { case (_, (v0, _)) => v0 == v })
            case 2 =>
              val lo = rnd.nextInt(50).toLong
              (col("v") >= lo, { case (_, (v0, _)) => v0 >= lo })
            case 3 =>
              val (a, b) = (rnd.nextInt(50).toLong, rnd.nextInt(45).toLong)
              (col("v") === a || col("k") === b,
                { case (k0, (v0, _)) => v0 == a || k0 == b })
          }
        val got = t.scan(pred).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        val want = oracle.toMap.filter(keep)
        assert(got == want, s"batch $batch predicate $pred")
      }
    }
  }

  test("string-column churn: range-bitmap sidecars + string index probes stay exact") {
    // same churn harness over a STRING value column: the range-bitmap
    // file index and the secondary index's lexicographic interval
    // probes both sit between every predicate and the answer
    val rnd = new scala.util.Random(4321)
    val strSch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    def sdf(rows: Seq[(Long, String, Long)]) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, strSch)
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", null)
    val t = GraftTable.create(spark, tmp(), strSch,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "bucket" -> "2",
        GraftTable.SecIndexColumns -> "s",
        graft.core.RangeIndex.OptionColumns -> "s"))
    val oracle = scala.collection.mutable.Map.empty[Long, (String, Long)]
    var seq = 0L
    for (batch <- 1 to 6) {
      val ups = (1 to 25).map { _ =>
        seq += 1
        (rnd.nextInt(30).toLong, words(rnd.nextInt(words.size)), seq)
      }
      ups.foreach { case (k, s, sq) =>
        if (oracle.get(k).forall(_._2 < sq)) oracle(k) = (s, sq)
      }
      t.write(sdf(ups))
      if (batch % 3 == 0) t.compact()
      for (_ <- 0 until 3) {
        val (pred, keep): (org.apache.spark.sql.Column, ((Long, (String, Long))) => Boolean) =
          rnd.nextInt(4) match {
            case 0 =>
              val w = words(rnd.nextInt(words.size - 1)) // non-null
              (col("s") === w, { case (_, (s0, _)) => s0 == w })
            case 1 =>
              val (a, b0) = (words(rnd.nextInt(words.size - 1)),
                words(rnd.nextInt(words.size - 1)))
              val (lo, hi) = if (a <= b0) (a, b0) else (b0, a)
              (col("s") >= lo && col("s") <= hi,
                { case (_, (s0, _)) => s0 != null && s0 >= lo && s0 <= hi })
            case 2 =>
              (col("s").isNull, { case (_, (s0, _)) => s0 == null })
            case 3 =>
              val w = words(rnd.nextInt(words.size - 1))
              val p = w.substring(0, 2)
              (col("s").startsWith(p),
                { case (_, (s0, _)) => s0 != null && s0.startsWith(p) })
          }
        val got = t.scan(pred).collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
        val want = oracle.toMap.filter(keep)
        assert(got == want, s"batch $batch predicate $pred")
      }
    }
  }

  test("poisoned index sidecar: pruning fails open, no rows lost") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, sch,
      options = Map("file-index.bloom-filter.columns" -> "k"))
    // interleaved keys so min/max stats cannot prune — only the bloom
    t.write(df((0L until 40L).filter(_ % 2 == 0).map(k => (k, k, 0L))).coalesce(1))
    t.write(df((0L until 40L).filter(_ % 2 == 1).map(k => (k, k, 0L))).coalesce(1))
    // corrupt every bloom sidecar on disk
    val idxDir = java.nio.file.Paths.get(dir, "index")
    val poisoned = Files.walk(idxDir).iterator().asScala
      .filter(_.toString.endsWith(".bloom")).toSeq
    assert(poisoned.nonEmpty, "expected bloom sidecars to exist")
    poisoned.foreach(p => Files.write(p, Array[Byte](1, 2, 3)))
    // a FRESH table instance (no sidecar cache) must still answer the
    // point query correctly: deserialization failure → fail-open scan
    // (and a graft.GraftTable warning, visible in the log)
    val t2 = GraftTable.load(spark, dir)
    val hit = t2.scan(col("k") === 17L).collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(17L))
    assert(t2.scan(col("k") === 17L).inputFiles.nonEmpty)
  }
}
