package graft

import graft.core.{FileIO, LocalFileIO, SnapshotManager}
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Fault-injecting metadata IO: every FileIO call against the
  * snapshot/manifest/schema surfaces can, per a SEEDED schedule, throw
  * before acting (crash before the op), throw after acting (the op
  * landed but the caller never learned — the lost-response/ambiguous
  * class), or stage a truncated `.tmp.` next to the target and throw
  * (crash between stage and publish). Reads only get throw-before (a
  * read has no partial effect).
  *
  * Seeded + budgeted: the same seed replays the same schedule, and the
  * per-step budget guarantees the driven workload can always make
  * progress on retry. Test-tree only — the shipped FileIOs never
  * inject. */
final class FaultFileIO(inner: FileIO = new LocalFileIO) extends FileIO {
  @volatile private var rng: java.util.Random = null
  @volatile private var prob: Double = 0.0
  private val budget = new java.util.concurrent.atomic.AtomicInteger(0)
  val injected = new java.util.concurrent.atomic.AtomicInteger(0)

  @volatile private var pathFilter: String = ""
  @volatile private var opFilter: String = ""
  @volatile private var forcedMode: Int = 0

  /** `pathContains`/`opContains` restrict eligible ops; `forceMode`
    * pins the fault kind (1=before, 2=after, 3=staged) instead of
    * rolling it — for tests that target ONE exact window. */
  def arm(seed: Long, probability: Double, maxFaults: Int,
      pathContains: String = "", opContains: String = "",
      forceMode: Int = 0): Unit = {
    rng = new java.util.Random(seed); prob = probability; budget.set(maxFaults)
    pathFilter = pathContains; opFilter = opContains; forcedMode = forceMode
  }
  def disarm(): Unit = {
    rng = null; prob = 0.0; pathFilter = ""; opFilter = ""; forcedMode = 0
  }

  /** Fault only the commit-protocol surfaces — data files are written
    * by executors outside FileIO, and faulting every exists() probe
    * adds noise without exercising new recovery paths. */
  private def metadataPath(p: String): Boolean =
    p.contains("/snapshot") || p.contains("/manifest/") ||
      p.contains("/schema/") || p.endsWith("/LATEST") ||
      p.contains("changelog-retained")

  private def roll(op: String, p: String, modes: Int): Int = {
    val r = rng
    if (r == null || !metadataPath(p) || !p.contains(pathFilter) ||
      !op.contains(opFilter)) 0
    else r.synchronized {
      if (r.nextDouble() >= prob) 0
      else if (budget.getAndDecrement() <= 0) { budget.incrementAndGet(); 0 }
      else {
        injected.incrementAndGet()
        if (forcedMode > 0) math.min(forcedMode, modes) else 1 + r.nextInt(modes)
      }
    }
  }
  private def boom(op: String, p: String): Nothing =
    throw new java.io.IOException(s"injected fault: $op $p")

  private def stageDebris(path: String, content: String): Unit = {
    val tmp = Paths.get(path + ".tmp.injected-" + System.nanoTime())
    Files.createDirectories(tmp.getParent)
    Files.write(tmp,
      content.substring(0, content.length / 2)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
  }

  override def readString(path: String): String = {
    if (roll("readString", path, 1) == 1) boom("readString", path)
    inner.readString(path)
  }
  override def readBytes(path: String): Array[Byte] = {
    if (roll("readBytes", path, 1) == 1) boom("readBytes", path)
    inner.readBytes(path)
  }
  override def writeString(path: String, content: String): Unit =
    roll("writeString", path, 3) match {
      case 0 => inner.writeString(path, content)
      case 1 => boom("writeString(before)", path)
      case 2 => inner.writeString(path, content); boom("writeString(after)", path)
      case 3 => stageDebris(path, content); boom("writeString(staged)", path)
    }
  override def writeBytes(path: String, content: Array[Byte]): Unit =
    roll("writeBytes", path, 2) match {
      case 0 => inner.writeBytes(path, content)
      case 1 => boom("writeBytes(before)", path)
      case 2 => inner.writeBytes(path, content); boom("writeBytes(after)", path)
    }
  override def tryCreateAtomic(path: String, content: String): Boolean =
    roll("tryCreateAtomic", path, 3) match {
      case 0 => inner.tryCreateAtomic(path, content)
      case 1 => boom("tryCreateAtomic(before)", path)
      case 2 =>
        // the torn-response CAS: the snapshot LANDED, the caller sees
        // an IO error — the exact ambiguity the commit loop's
        // "references OUR manifest" recheck exists for
        inner.tryCreateAtomic(path, content); boom("tryCreateAtomic(after)", path)
      case 3 => stageDebris(path, content); boom("tryCreateAtomic(staged)", path)
    }
  override def delete(path: String): Unit =
    roll("delete", path, 2) match {
      case 0 => inner.delete(path)
      case 1 => boom("delete(before)", path)
      case 2 => inner.delete(path); boom("delete(after)", path)
    }
  override def list(dir: String): Seq[String] = {
    if (roll("list", dir + "/", 1) == 1) boom("list", dir)
    inner.list(dir)
  }
  override def rename(src: String, dst: String): Unit = {
    if (roll("rename", dst, 1) == 1) boom("rename", dst)
    inner.rename(src, dst)
  }
  // probes stay clean: exists/size faults only test trivial propagation
  // and would starve the schedule's budget on the interesting ops
  override def exists(path: String): Boolean = inner.exists(path)
  override def size(path: String): Long = inner.size(path)
  override def mkdirs(path: String): Unit = inner.mkdirs(path)
}

/** Crash-consistency battery for the commit/expire/compact/rollback
  * protocol: randomized seeded fault schedules drive the full
  * write→compact→expire→rollback loop through [[FaultFileIO]], and
  * after EVERY step (crashed or not) a clean-IO checker asserts the
  * recovery invariants the protocol promises:
  *
  *  1. no torn metadata is ever visible — every listed snapshot parses,
  *     its manifest list and manifests parse, and every live data file
  *     it references exists on disk;
  *  2. snapshot ids are gapless;
  *  3. the table content equals either the pre-step or the post-step
  *     state (commit atomicity — never a blend), and a crashed step
  *     retried to completion converges on the post state;
  *  4. crash leftovers are reclaimable: after the schedule,
  *     remove_orphan_files + the staging-debris sweep leave only
  *     referenced files, and a final clean write + read works.
  *
  * The r15 torn-read CAS bug (CREATE_NEW made the snapshot path
  * visible EMPTY before its content) survived 14 rounds of green
  * functional specs; the last test reproduces that exact pre-fix
  * behavior behind a FileIO and shows THIS battery's checker catches
  * it, while the shipped staged+hard-link implementation survives the
  * same schedule (reference contract: paimon-core
  * operation/FileStoreCommitImpl.java:114 tryCommit + SnapshotManager
  * CAS). */
class FaultBatterySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmp(): String =
    Files.createTempDirectory("graft-fault").toString + "/t"

  private val kvSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  private def kvDf(rows: Seq[(Long, Long)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2)).asJava, kvSchema)
  }

  /** Invariants 1+2 via a FRESH clean-IO manager (no caches shared
    * with the faulted writer). */
  private def checkIntegrity(dir: String): Unit = {
    val sm = new SnapshotManager(dir)
    val ids = sm.snapshotIds
    assert(ids == (ids.headOption.getOrElse(0L) to ids.lastOption.getOrElse(-1L)),
      s"snapshot ids not gapless: $ids")
    ids.foreach { id =>
      val s = sm.snapshot(id) // parses or the battery fails loudly
      val manifests = sm.readManifestList(s.manifestList)
      (manifests ++ s.deltaManifest ++ s.changelogManifest).foreach { m =>
        sm.readManifest(m) // parses
      }
      sm.liveEntries(s).foreach { e =>
        assert(Files.exists(Paths.get(s"$dir/${e.file.fileName}")),
          s"snapshot $id references missing file ${e.file.fileName}")
      }
    }
  }

  private def readState(dir: String): Map[Long, Long] =
    GraftTable.load(spark, dir).read
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** One seeded schedule: 12 steps of write/compact/expire/rollback
    * under injected faults, invariant-checked after every step, then
    * the reclamation pass and a clean closing write. */
  /** @return number of injected faults, so the battery can assert it
    *         actually exercised crash windows. */
  private def runSchedule(seed: Int, inner: FileIO = new LocalFileIO): Int = {
    val dir = tmp()
    GraftTable.create(spark, dir, kvSchema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "2", "commit.max-retries" -> "20",
        "commit.min-retry-wait" -> "1ms", "commit.max-retry-wait" -> "20ms"))
    // inner selects the semantic surface the faults compose over —
    // POSIX (staged tmp + hard-link CAS) or object-store (atomic PUT,
    // conditional-PUT CAS, copy+delete rename): the commit protocol
    // must survive either
    val fio = new FaultFileIO(inner)
    val faulted = GraftTable.load(spark, dir, fio)
    val r = new scala.util.Random(seed * 7919L)
    var model = Map.empty[Long, Long]
    var crashes = 0
    for (step <- 1 to 12) {
      val batch = (0 until (1 + r.nextInt(4)))
        .map(_ => (r.nextInt(12).toLong, r.nextLong(1000000L)))
        .groupBy(_._1).map { case (k, vs) => (k, vs.last._2) }.toSeq
      val action = r.nextInt(10)
      val expected: Map[Long, Long] =
        if (action <= 5) model ++ batch else model // maintenance keeps content
      def attempt(): Unit = action match {
        case a if a <= 5 => faulted.write(kvDf(batch))
        case 6 | 7 => faulted.compact()
        case 8 => faulted.expireSnapshots(3)
        case 9 =>
          val latest = faulted.sm.latestSnapshotId.getOrElse(-1L)
          val earliest = faulted.sm.snapshotIds.headOption.getOrElse(-1L)
          if (latest > earliest)
            faulted.sm.rollbackTo(math.max(earliest, latest - 1))
      }
      fio.arm(seed * 1000L + step, probability = 0.30, maxFaults = 3)
      val crashed =
        try { attempt(); false }
        catch { case _: Throwable => crashes += 1; true }
      // invariants hold IN the crashed state, before any recovery
      fio.disarm()
      checkIntegrity(dir)
      val observed = readState(dir)
      if (action == 9) {
        // rollback legitimately rewinds content; just re-adopt disk
        model = observed
      } else if (!crashed) {
        assert(observed == expected,
          s"seed $seed step $step: clean step diverged: $observed vs $expected")
        model = expected
      } else {
        // atomicity: pre-state or post-state, never a blend
        assert(observed == model || observed == expected,
          s"seed $seed step $step: torn content after crash: $observed " +
            s"(pre=$model post=$expected)")
        // recovery: retry the step fault-free until it converges.
        // Content must land on the post-state for every action except
        // rollback (whose post-state is the rewind itself).
        attempt()
        checkIntegrity(dir)
        val after = readState(dir)
        assert(after == expected || action == 9,
          s"seed $seed step $step: retry did not converge: $after vs $expected")
        model = after
      }
    }
    // reclamation: crash leftovers (orphaned data/manifests from
    // mid-crash expires, staged .tmp. debris) all sweep, and nothing
    // referenced is touched
    val preSweep = readState(dir)
    GraftTable.load(spark, dir).removeOrphanFiles(graceMillis = 0L)
    checkIntegrity(dir)
    assert(readState(dir) == preSweep, s"seed $seed: orphan sweep changed content")
    assert(graft.core.FsUtil.walkAll(Paths.get(s"$dir/snapshot")).forall(p =>
      !p.getFileName.toString.contains(".tmp.")),
      s"seed $seed: staged snapshot debris survived the sweep")
    // manifest dir holds ONLY live manifests after the sweep: no
    // crashed staging, no CAS-loser delta manifests
    val cleanSm = new SnapshotManager(dir)
    val live = (cleanSm.snapshotIds.map(cleanSm.snapshot) ++ cleanSm.tagSnapshots)
      .flatMap(sn => (cleanSm.readManifestList(sn.manifestList) :+ sn.manifestList) ++
        sn.deltaManifest ++ sn.changelogManifest).toSet ++
      cleanSm.retainedChangelogs.map(_.manifest).toSet
    val leftover = graft.core.FsUtil.walkAll(Paths.get(s"$dir/manifest"))
      .filter(Files.isRegularFile(_)).map(_.getFileName.toString)
      .filterNot(live.contains)
    assert(leftover.isEmpty, s"seed $seed: orphan manifests survived: $leftover")
    // the table stays writable with clean IO after everything
    val t = GraftTable.load(spark, dir)
    t.write(kvDf(Seq((99L, 99L))))
    assert(readState(dir) == preSweep + (99L -> 99L))
    fio.injected.get()
  }

  test("fault battery: 24 randomized metadata-fault schedules, invariants after every step") {
    val totalInjected = (1 to 24).map(seed => runSchedule(seed)).sum
    // the battery must actually be injecting, or every assertion above
    // is a clean-path tautology
    assert(totalInjected >= 40, s"only $totalInjected faults fired")
  }

  test("fault battery over OBJECT-STORE semantics: conditional-PUT CAS + copy-delete rename") {
    val totalInjected = (101 to 108)
      .map(seed => runSchedule(seed, new graft.core.ObjectStoreFileIO)).sum
    assert(totalInjected >= 12, s"only $totalInjected faults fired")
  }

  test("ambiguous CAS (landed, response lost): streaming identifier replay does not duplicate") {
    val dir = tmp()
    GraftTable.create(spark, dir, kvSchema,
      primaryKeys = Seq("k"), options = Map("bucket" -> "1"))
    val fio = new FaultFileIO
    val sm = new SnapshotManager(dir, io = fio)
    val t = GraftTable.load(spark, dir, fio)
    t.write(kvDf(Seq((1L, 1L))))
    // force the NEXT tryCreateAtomic to land and then throw
    val base = new SnapshotManager(dir)
    val landedId = base.latestSnapshotId.get
    fio.arm(seed = 42L, probability = 1.0, maxFaults = 1,
      pathContains = "/snapshot/snapshot-", opContains = "tryCreateAtomic",
      forceMode = 2)
    val thrown = intercept[java.io.IOException] { t.write(kvDf(Seq((2L, 2L)))) }
    assert(thrown.getMessage.contains("injected"))
    fio.disarm()
    // the commit LANDED despite the error:
    assert(new SnapshotManager(dir).latestSnapshotId.get == landedId + 1)
    checkIntegrity(dir)
    assert(readState(dir) == Map(1L -> 1L, 2L -> 2L))
  }

  // ---- concurrent battery: racing committers under faults ------------

  /** Two writers + one compactor race through a seeded fault schedule,
    * faults injected on BOTH writers' AND the compactor's IO (incl.
    * the ambiguous landed-but-response-lost CAS on each side). Each
    * writer owns a disjoint key range and retries each batch to
    * completion, so the expected terminal state is exact; after the
    * race the single-writer battery's invariants must hold PLUS
    * exactly-one-winner (gapless parseable history is that — two
    * winners of one id would mean a torn/overwritten snapshot, which
    * integrity + content equality would catch).
    *
    * Reference contract: FileStoreCommitImpl.java:114-126 tryCommit
    * under racing committers. */
  private def runConcurrentSchedule(
      seed: Int, innerFactory: () => FileIO,
      preMade: Option[String] = None): Int = {
    val dir = preMade.getOrElse {
      val d = tmp()
      GraftTable.create(spark, d, kvSchema,
        primaryKeys = Seq("k"),
        options = Map("bucket" -> "2", "commit.max-retries" -> "40",
          "commit.min-retry-wait" -> "1ms", "commit.max-retry-wait" -> "20ms"))
      d
    }
    val rnd = new scala.util.Random(seed * 104729L)
    // writer w owns keys [w*10, w*10+10); every batch writes the whole
    // range, so the terminal state is exactly the LAST batch per writer
    val batches: Map[Int, Seq[Seq[(Long, Long)]]] = (0 to 1).map { w =>
      w -> Seq.fill(4)((0 until 10).map(k =>
        ((w * 10 + k).toLong, rnd.nextLong(1000000L))))
    }.toMap
    val fios = (0 to 2).map(_ => new FaultFileIO(innerFactory()))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(w: Int): Thread = new Thread(() => {
      try {
        val t = GraftTable.load(spark, dir, fios(w))
        fios(w).arm(seed * 1000L + w, probability = 0.25, maxFaults = 4)
        batches(w).foreach { batch =>
          var landed = false
          var tries = 0
          while (!landed) {
            try { t.write(kvDf(batch)); landed = true }
            catch {
              case e: Throwable =>
                tries += 1
                if (tries > 30) { errs.add(e); landed = true }
            }
          }
        }
      } catch { case e: Throwable => errs.add(e) }
    })
    val compactor = new Thread(() => {
      try {
        val t = GraftTable.load(spark, dir, fios(2))
        fios(2).arm(seed * 2000L, probability = 0.25, maxFaults = 3)
        (0 until 3).foreach { _ =>
          // compaction may lose conflicts or hit injected faults —
          // both are legitimate outcomes; content invariants decide
          try t.compact() catch { case _: Throwable => () }
          Thread.sleep(20)
        }
      } catch { case _: Throwable => () }
    })
    val threads = Seq(writer(0), writer(1), compactor)
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(threads.forall(!_.isAlive), s"seed $seed: racing committer hung")
    fios.foreach(_.disarm())
    import scala.jdk.CollectionConverters._
    assert(errs.isEmpty,
      s"seed $seed: committer gave up: ${errs.asScala.toList}")
    checkIntegrity(dir)
    val expected: Map[Long, Long] =
      batches.values.flatMap(_.last).toMap
    assert(readState(dir) == expected,
      s"seed $seed: racing committers lost/duplicated rows")
    // reclamation after the race: loser manifests + staged debris sweep
    GraftTable.load(spark, dir).removeOrphanFiles(graceMillis = 0L)
    checkIntegrity(dir)
    assert(readState(dir) == expected)
    fios.map(_.injected.get()).sum
  }

  test("concurrent fault battery: 8 schedules of 2 writers + compactor, POSIX surface") {
    val injected = (201 to 208)
      .map(seed => runConcurrentSchedule(seed, () => new LocalFileIO)).sum
    assert(injected >= 16, s"only $injected faults fired")
  }

  test("concurrent fault battery over OBJECT-STORE semantics: 6 schedules") {
    val injected = (301 to 306)
      .map(seed => runConcurrentSchedule(seed,
        () => new graft.core.ObjectStoreFileIO)).sum
    assert(injected >= 10, s"only $injected faults fired")
  }

  test("concurrent fault battery over REST-ARBITRATED commits: 6 schedules") {
    // the server is the CAS authority; each committer talks to it
    // through its own faulted client IO — including the ambiguous
    // committed-on-server-but-response-lost class
    val warehouse = Files.createTempDirectory("graft-fault-rest").toString
    val server = graft.sources.GraftRestServer.start(warehouse, token = "fb")
    try {
      val injected = (401 to 406).map { seed =>
        val dir = s"$warehouse/fb/t$seed"
        GraftTable.create(spark, dir, kvSchema,
          primaryKeys = Seq("k"),
          options = Map("bucket" -> "2", "commit.max-retries" -> "40",
            "commit.min-retry-wait" -> "1ms", "commit.max-retry-wait" -> "20ms"))
        runConcurrentSchedule(seed,
          () => new graft.sources.RestArbitratedIO(
            new LocalFileIO, server.uri, "fb", "fb", s"t$seed", dir),
          preMade = Some(dir))
      }.sum
      assert(injected >= 10, s"only $injected faults fired")
    } finally server.stop()
  }

  test("concurrent fault battery over JDBC-LOCK commits + lock-holder crash leases out") {
    val dbDir = Files.createTempDirectory("graft-fault-jdbc").toString
    val uri = s"jdbc:derby:$dbDir/locks;create=true"
    graft.sources.JdbcBridge.init(uri)
    // lock-holder crash: a committer "dies" holding the commit lock (a
    // raw acquire with a 1 s lease, never released) — the next
    // committer must wait out the lease, sweep the corpse and proceed
    val crashedScope = "crashed-table"
    val dir0 = tmp()
    GraftTable.create(spark, dir0, kvSchema, primaryKeys = Seq("k"),
      options = Map("bucket" -> "1"))
    val lockedIo = new graft.sources.JdbcLockedIO(
      new LocalFileIO, uri, crashedScope, expireSecs = 5L)
    assert(graft.sources.JdbcBridge.lockAcquireToken(
      uri, s"commit:$crashedScope", expireSecs = 1L).isDefined)
    // measure the arbitrated op itself, immediately after the corpse
    // took the lock: it must block for the remaining lease, not barge
    val t0 = System.nanoTime()
    assert(lockedIo.tryCreateAtomic(s"$dir0/snapshot/corpse-probe", "x"))
    val waitedMs = (System.nanoTime() - t0) / 1000000L
    assert(waitedMs >= 500,
      s"committer proceeded in ${waitedMs}ms — it cannot have honored the 1s corpse lease")
    new LocalFileIO().delete(s"$dir0/snapshot/corpse-probe")
    // ...and a real commit through the same lock works end-to-end
    GraftTable.load(spark, dir0, lockedIo).write(kvDf(Seq((1L, 1L))))
    assert(readState(dir0) == Map(1L -> 1L),
      "write through the lease-swept lock did not land")
    checkIntegrity(dir0)

    // full concurrent schedules where tryCreateAtomic is the
    // lock-serialized check-then-write (no native conditional create):
    // faults + racing writers must still converge exactly-one-winner
    val injected = (501 to 504).map { seed =>
      runConcurrentSchedule(seed,
        () => new graft.sources.JdbcLockedIO(
          new LocalFileIO, uri, s"t$seed", expireSecs = 30L))
    }.sum
    assert(injected >= 6, s"only $injected faults fired")
  }

  /** The r15 torn-read bug, reproduced behind a FileIO: CREATE_NEW
    * makes the snapshot path visible EMPTY before the content lands. A
    * concurrent reader's exists()→read() parses torn JSON — exactly
    * what 14 rounds of green specs never caught. The battery's checker
    * catches it; the shipped staged+hard-link LocalFileIO survives the
    * same concurrent schedule. */
  private final class TornCreateIO extends FileIO {
    private val inner = new LocalFileIO
    override def readString(path: String): String = inner.readString(path)
    override def writeString(path: String, content: String): Unit =
      inner.writeString(path, content)
    override def readBytes(path: String): Array[Byte] = inner.readBytes(path)
    override def writeBytes(path: String, content: Array[Byte]): Unit =
      inner.writeBytes(path, content)
    override def exists(path: String): Boolean = inner.exists(path)
    override def mkdirs(path: String): Unit = inner.mkdirs(path)
    override def list(dir: String): Seq[String] = inner.list(dir)
    override def delete(path: String): Unit = inner.delete(path)
    override def rename(src: String, dst: String): Unit = inner.rename(src, dst)
    override def size(path: String): Long = inner.size(path)
    override def tryCreateAtomic(path: String, content: String): Boolean = {
      val p = Paths.get(path)
      Files.createDirectories(p.getParent)
      try Files.write(p, Array.emptyByteArray, StandardOpenOption.CREATE_NEW)
      catch { case _: java.nio.file.FileAlreadyExistsException => return false }
      Thread.sleep(15) // the pre-fix race window, widened to determinism
      Files.write(p, content.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        StandardOpenOption.WRITE)
      true
    }
  }

  private def raceCommitsAgainstReader(io: FileIO): Option[Throwable] = {
    val dir = tmp()
    GraftTable.create(spark, dir, kvSchema,
      primaryKeys = Seq("k"), options = Map("bucket" -> "1"))
    val t = GraftTable.load(spark, dir, io)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val seen = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val reader = new Thread(() => {
      val rsm = new SnapshotManager(dir) // clean reader, like a 2nd engine
      while (!stop.get()) {
        try rsm.latestSnapshot().foreach(_ => ())
        catch {
          case e: Throwable => seen.compareAndSet(null, e); stop.set(true)
        }
      }
    })
    reader.start()
    (1 to 8).foreach { i => t.write(kvDf(Seq((i.toLong, i.toLong)))) }
    stop.set(true)
    reader.join(10000)
    Option(seen.get())
  }

  test("r15 torn-read reproduction: the pre-fix CREATE_NEW path fails the battery, the shipped path survives") {
    val torn = raceCommitsAgainstReader(new TornCreateIO)
    assert(torn.isDefined,
      "expected the pre-fix CREATE_NEW behavior to surface a torn read")
    val fixed = raceCommitsAgainstReader(new LocalFileIO)
    assert(fixed.isEmpty,
      s"shipped tryCreateAtomic leaked a torn read: ${fixed.map(_.toString)}")
  }
}
