package graft

import graft.table.{GraftCommitCallback, GraftTable, GraftTagCallback}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

object TagLifecycleSpec {
  // reflective-callback targets: the table loads these by class name,
  // so they must be top-level objects with stable recording state
  val tagEvents = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val commitEvents = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

class RecordingTagCallback extends GraftTagCallback {
  override def notifyCreation(t: GraftTable, name: String): Unit =
    TagLifecycleSpec.tagEvents.add(s"create:$name")
  override def notifyDeletion(t: GraftTable, name: String): Unit =
    TagLifecycleSpec.tagEvents.add(s"delete:$name")
}

class RecordingCommitCallback(param: String) extends GraftCommitCallback {
  override def call(t: GraftTable, id: Long): Unit =
    TagLifecycleSpec.commitEvents.add(s"$param:$id")
}

/** Tag lifecycle options (reference: tag/TagAutoCreation.java,
  * TagTimeExpire.java, SuccessFileTagCallback.java,
  * TagBatchCreation.java, CoreOptions tag.* keys) and commit
  * callbacks + full-compaction.delta-commits. */
class TagLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-taglc").toString + "/t"

  private def kv(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def mk(opts: Map[String, String]): GraftTable =
    GraftTable.create(spark, tmp(), kv((1L, "a")).schema,
      primaryKeys = Seq("k"), options = Map("bucket" -> "1") ++ opts)

  test("tag.default-time-retained stamps tags; expire drops only lapsed ones; =false disables") {
    val t = mk(Map("tag.default-time-retained" -> "50ms"))
    t.write(kv(1L -> "a"))
    t.createTag("short")
    t.createTag("long", timeRetainedMs = Some(3600000L))
    // a pre-retention tag (no stamp) must never expire
    t.sm.createTag("legacy", t.sm.latestSnapshotId.get)
    assert(t.sm.tagSnapshot("short").get.tagTimeRetained.contains(50L))
    assert(t.sm.tagSnapshot("legacy").get.tagTimeRetained.isEmpty)
    Thread.sleep(80)
    val expired = t.expireTimedOutTags()
    assert(expired == Seq("short"))
    assert(t.sm.tags.keySet == Set("long", "legacy"))

    // commit-coupled: the next write expires a lapsed tag automatically
    t.createTag("short2", timeRetainedMs = Some(10L))
    Thread.sleep(40)
    t.write(kv(2L -> "b"))
    assert(!t.sm.tags.contains("short2"))

    // the kill switch
    val t2 = mk(Map("tag.default-time-retained" -> "10ms",
      "tag.time-expire-enabled" -> "false"))
    t2.write(kv(1L -> "a"))
    t2.createTag("kept")
    Thread.sleep(40)
    assert(t2.expireTimedOutTags().isEmpty && t2.sm.tags.contains("kept"))
  }

  test("tag.create-success-file writes and removes the _SUCCESS companion") {
    val t = mk(Map("tag.create-success-file" -> "true"))
    t.write(kv(1L -> "a"))
    t.createTag("t1")
    val f = Paths.get(s"${t.path}/tag-success-file/t1_SUCCESS")
    assert(Files.exists(f))
    val json = graft.core.Json.mapper.readTree(Files.readString(f))
    assert(json.get("creationTime").asLong() > 0)
    assert(json.get("modificationTime").asLong() >= json.get("creationTime").asLong())
    // replace keeps creationTime, bumps modificationTime
    val c0 = json.get("creationTime").asLong()
    Thread.sleep(5)
    t.replaceTag("t1")
    val json2 = graft.core.Json.mapper.readTree(Files.readString(f))
    assert(json2.get("creationTime").asLong() == c0)
    t.deleteTag("t1")
    assert(!Files.exists(f))
  }

  test("tag.callbacks notify creation and deletion reflectively") {
    TagLifecycleSpec.tagEvents.clear()
    val t = mk(Map("tag.callbacks" -> classOf[RecordingTagCallback].getName))
    t.write(kv(1L -> "a"))
    t.createTag("x")
    t.deleteTag("x")
    import scala.jdk.CollectionConverters._
    assert(TagLifecycleSpec.tagEvents.asScala.toSeq == Seq("create:x", "delete:x"))
  }

  test("commit.callbacks fire per committed snapshot with the configured param") {
    TagLifecycleSpec.commitEvents.clear()
    val cls = classOf[RecordingCommitCallback].getName
    val t = mk(Map("commit.callbacks" -> cls,
      s"commit.callback.$cls.param" -> "audit"))
    t.write(kv(1L -> "a"))
    t.write(kv(2L -> "b"))
    import scala.jdk.CollectionConverters._
    assert(TagLifecycleSpec.commitEvents.asScala.toSeq == Seq("audit:0", "audit:1"))
  }

  test("tag.automatic-completion fills skipped periods one at a time") {
    val day = 86400000L
    def at(t: GraftTable, ms: Long, r: (Long, String)): Unit =
      t.writeWatermarked(kv(r), -1L, Some(ms))
    // completion OFF: a 3-day jump names the tag for the latest
    // completed period, skipping the middle days
    val off = mk(Map("tag.automatic-creation" -> "watermark"))
    at(off, day * 10 + 1, 1L -> "a")
    at(off, day * 11 + 1, 2L -> "b") // completes day 10
    at(off, day * 14 + 1, 3L -> "c") // jumps to day 14: completes day 13
    off.tagAutoCreate()
    assert(off.sm.tags.keySet == Set("1970-01-10", "1970-01-11", "1970-01-14"))

    val on = mk(Map("tag.automatic-creation" -> "watermark",
      "tag.automatic-completion" -> "true"))
    at(on, day * 10 + 1, 1L -> "a")
    at(on, day * 11 + 1, 2L -> "b")
    at(on, day * 14 + 1, 3L -> "c") // jump: fills 1970-01-12, not -14
    assert(on.sm.tags.keySet == Set("1970-01-10", "1970-01-11", "1970-01-12"))
    // each later snapshot fills ONE more missing period (reference
    // fills one per snapshot visit: thisTag = nextTag)
    at(on, day * 14 + 2, 4L -> "d")
    at(on, day * 14 + 3, 5L -> "e")
    assert(on.sm.tags.keySet.contains("1970-01-13"))
    assert(on.sm.tags.keySet.contains("1970-01-14"))
  }

  test("tag.automatic-completion single-fill contract: a long-idle table's " +
    "next commit fills exactly ONE missing period") {
    val day = 86400000L
    def at(t: GraftTable, ms: Long, r: (Long, String)): Unit =
      t.writeWatermarked(kv(r), -1L, Some(ms))
    val t = mk(Map("tag.automatic-creation" -> "watermark",
      "tag.automatic-completion" -> "true"))
    at(t, day * 10 + 1, 1L -> "a")
    at(t, day * 11 + 1, 2L -> "b")
    assert(t.sm.tags.keySet == Set("1970-01-10", "1970-01-11"))
    // idle for FIVE periods, then one commit: the completion contract
    // (reference TagAutoCreation.tryToCreateTags, thisTag = nextTag)
    // fills exactly the FIRST missing period per snapshot visit — a
    // gap > 1 is worked off one tag per commit, never a burst of
    // backfilled tags from a single snapshot
    at(t, day * 16 + 1, 3L -> "c")
    assert(t.sm.tags.keySet ==
      Set("1970-01-10", "1970-01-11", "1970-01-12"),
      t.sm.tags.keySet.toString)
    // re-triggering with NO new snapshot creates nothing: the cursor
    // sits past the latest tagged snapshot
    assert(t.tagAutoCreate().isEmpty)
    assert(t.sm.tags.keySet ==
      Set("1970-01-10", "1970-01-11", "1970-01-12"))
    // each subsequent commit fills the next missing period in order
    at(t, day * 16 + 2, 4L -> "d")
    assert(t.sm.tags.keySet ==
      Set("1970-01-10", "1970-01-11", "1970-01-12", "1970-01-13"))
    at(t, day * 16 + 3, 5L -> "e")
    at(t, day * 16 + 4, 6L -> "f")
    assert(t.sm.tags.keySet == Set("1970-01-10", "1970-01-11",
      "1970-01-12", "1970-01-13", "1970-01-14", "1970-01-15"),
      t.sm.tags.keySet.toString)
  }

  test("tag.period-formatter without_dashes + two-hours period") {
    val t = mk(Map("tag.automatic-creation" -> "watermark",
      "tag.period-formatter" -> "without_dashes"))
    t.writeWatermarked(kv(1L -> "a"), -1L, Some(86400000L * 3 + 1))
    t.writeWatermarked(kv(2L -> "b"), -1L, Some(86400000L * 4 + 1))
    assert(t.sm.tags.keySet == Set("19700103", "19700104"))

    val h2 = mk(Map("tag.automatic-creation" -> "watermark",
      "tag.creation-period" -> "two-hours",
      "tag.period-formatter" -> "without_dashes_and_spaces"))
    h2.writeWatermarked(kv(1L -> "a"), -1L, Some(7200000L * 5 + 1))
    h2.writeWatermarked(kv(2L -> "b"), -1L, Some(7200000L * 6 + 1))
    // completed periods are named for their start hours 08 and 10
    assert(h2.sm.tags.keySet == Set("1970010108", "1970010110"))
  }

  test("tag.automatic-creation=batch replaces the batch tag and trims by num-retained-max") {
    val t = mk(Map("tag.automatic-creation" -> "batch",
      "tag.batch.customized-name" -> "nightly"))
    t.write(kv(1L -> "a"))
    assert(t.sm.tags.keySet == Set("nightly"))
    val sid1 = t.sm.tags("nightly")
    t.write(kv(2L -> "b"))
    assert(t.sm.tags.keySet == Set("nightly"))
    assert(t.sm.tags("nightly") > sid1) // re-pointed at the new snapshot

    // default name + trim: each write re-tags batch-write-<day of
    // snapshot time>; manual older tags beyond the cap get trimmed
    val d = mk(Map("tag.automatic-creation" -> "batch",
      "tag.num-retained-max" -> "1"))
    d.write(kv(1L -> "a"))
    val names = d.sm.tags.keySet
    assert(names.size == 1 && names.head.startsWith("batch-write-"))
  }

  test("full-compaction.delta-commits triggers a full compaction every N delta commits") {
    val t = mk(Map("full-compaction.delta-commits" -> "3"))
    t.write(kv(1L -> "a"))
    t.write(kv(2L -> "b"))
    def kinds = t.sm.snapshotIds.map(t.sm.snapshot(_).commitKind)
    assert(!kinds.contains("COMPACT"))
    t.write(kv(3L -> "c")) // third delta commit → auto full compaction
    assert(kinds.count(_ == "COMPACT") == 1)
    t.write(kv(4L -> "d"))
    t.write(kv(5L -> "e"))
    assert(kinds.count(_ == "COMPACT") == 1) // only 2 deltas since
    t.write(kv(6L -> "f"))
    assert(kinds.count(_ == "COMPACT") == 2)
    assert(t.read.count() == 6)
  }
}
