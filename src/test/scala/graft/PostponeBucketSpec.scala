package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Postpone bucket mode (bucket = -2): writes stage rows in an
  * unassigned bucket with no shuffle, every read surface ignores them
  * until a compaction hash-assigns real buckets, and the compaction
  * changelog carries the visibility diff (reference:
  * postpone/PostponeBucketWriter.java:55, table/PostponeUtils.java:34,
  * BucketMode postpone semantics). */
class PostponeBucketSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-postpone").toString + "/t"

  import scala.jdk.CollectionConverters._

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def df(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch)

  private def create(dir: String, extra: Map[String, String] = Map.empty) =
    GraftTable.create(spark, dir, sch, primaryKeys = Seq("k"),
      options = Map("bucket" -> "-2", "postpone.default-bucket-num" -> "3") ++ extra)

  private def liveBuckets(t: GraftTable): Set[Int] =
    t.sm.latestSnapshot().map(t.sm.liveEntries).getOrElse(Seq.empty)
      .map(_.bucket).toSet

  test("staged writes are invisible until compaction assigns buckets") {
    val t = create(tmp())
    t.write(df((0L until 20L).map(i => (i, s"a$i")): _*))
    // files staged in the postpone bucket only
    assert(liveBuckets(t) == Set(GraftTable.PostponeBucket))
    assert(t.read.count() == 0L, "staged data must not be readable")
    assert(t.countRows() == 0L)
    assert(t.scan(col("k") === 3L).count() == 0L)
    assert(t.lookup(Map("k" -> 3L)).count() == 0L)
    assert(t.auditLog.count() == 0L)

    t.compact()
    // all data now in real buckets, hashed over postpone.default-bucket-num
    val buckets = liveBuckets(t)
    assert(!buckets.contains(GraftTable.PostponeBucket))
    assert(buckets.nonEmpty && buckets.forall(b => b >= 0 && b < 3))
    assert(t.read.count() == 20L)
    assert(t.lookup(Map("k" -> 3L)).collect().map(_.getString(1)).toSeq == Seq("a3"))
  }

  test("merge semantics across staged generations and compacted state") {
    val t = create(tmp())
    t.write(df((0L until 10L).map(i => (i, "v1")): _*))
    t.write(df((0L until 5L).map(i => (i, "v2")): _*)) // update wave, later seq
    t.compact()
    val state = t.read.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state.size == 10)
    assert((0L until 5L).forall(state(_) == "v2"), "later staged write wins")
    assert((5L until 10L).forall(state(_) == "v1"))

    // post-compact writes stage again; deletes stage too
    t.delete(col("k") < 2L)
    t.write(df((10L, "new")))
    assert(t.read.count() == 10L, "staged delete+insert invisible")
    t.compact()
    val after = t.read.collect().map(_.getLong(0)).toSet
    assert(after == ((2L until 11L).toSet), "delete applied, insert visible")
  }

  test("incremental read serves the compaction changelog only") {
    val t = create(tmp())
    val s1 = t.write(df((0L until 4L).map(i => (i, "x")): _*))
    assert(t.incrementalRead(-1L, s1).count() == 0L,
      "staged appends are not changes")
    val s2 = t.compact().get
    val cl = t.incrementalRead(-1L, s2)
    assert(cl.filter(col("_row_kind") === "+I").count() == 4L)
    // second cycle: one update, one insert → exact pairs at compaction
    t.write(df((0L, "y"), (9L, "z")))
    val s3 = t.compact().get
    val cl2 = t.incrementalRead(s2, s3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(cl2 == Set((0L, "x", "-U"), (0L, "y", "+U"), (9L, "z", "+I")))
  }

  test("MERGE INTO and point surfaces operate on visible state") {
    val t = create(tmp())
    t.write(df((0L until 6L).map(i => (i, "base")): _*))
    t.compact()
    t.write(df((0L, "staged-noise"))) // pending, must not affect merge
    // localLookup falls back through the distributed path and still
    // sees only visible data
    assert(t.localLookup(Map("k" -> 0L)).map(_.getString(1)) == Seq("base"))
    assert(t.countRowsFast().isEmpty || t.countRowsFast().contains(6L))
  }

  test("postpone table guards: PK required, no native streaming") {
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmp(), sch, options = Map("bucket" -> "-2"))
    }
    val t = create(tmp())
    t.write(df((1L, "a")))
    t.compact()
    // the SQL/native micro-batch stream refuses postpone tables
    intercept[IllegalArgumentException] {
      new graft.sources.GraftMicroBatchStream(t, sch, sch, StructType(Nil), sch)
    }
  }

  test("writes do not shuffle: staged file count tracks input partitions") {
    val t = create(tmp())
    val in = spark.createDataFrame(
      (0L until 40L).map(i => Row(i, s"p$i")).asJava, sch).repartition(2)
    t.write(in)
    val staged = t.sm.latestSnapshot().map(t.sm.liveEntries).getOrElse(Seq.empty)
    assert(staged.forall(_.bucket == GraftTable.PostponeBucket))
    // 2 input partitions → at most 2 staged files (no bucket fan-out)
    assert(staged.size <= 2,
      s"expected <= 2 staged files for 2 input partitions, got ${staged.size}")
  }

  test("concurrent staged writers never lose a batch; interleaved compaction keeps them") {
    // the postpone promise at scale: MANY writers stage with zero
    // coordination (zero-shuffle appends racing on the commit CAS)
    // while compaction periodically assigns buckets — nothing lost,
    // nothing surfaced early
    val dir = tmp()
    val t = create(dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    try {
      val writers = (0 until 4).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val tw = GraftTable.load(spark, dir)
            (0 until 3).foreach { i =>
              val base = (w * 3 + i) * 100L
              tw.write(df((base until base + 100L).map(k => (k, s"w$w")): _*))
            }
          }
        })
      }
      // a compaction races the staging writers (CAS conflicts allowed:
      // staged entries it did not see survive as staged)
      val compactor = pool.submit(new Runnable {
        def run(): Unit = {
          Thread.sleep(50)
          try GraftTable.load(spark, dir).compact()
          catch { case _: IllegalStateException => () } // lost CAS is fine
        }
      })
      writers.foreach(_.get())
      compactor.get()
    } finally pool.shutdown()
    // final compaction surfaces everything exactly once
    val tr = GraftTable.load(spark, dir)
    tr.compact()
    val got = tr.read.select("k").collect().map(_.getLong(0)).sorted
    assert(got.length == 1200, s"expected 1200 distinct keys, got ${got.length}")
    assert(got.toSeq == (0L until 1200L))
    assert(liveBuckets(tr) == Set(0, 1, 2))
  }
}
