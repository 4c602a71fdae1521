package graft

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Deletion vectors: DELETE/UPDATE without file rewrites. */
class DeletionVectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-dv").toString + "/t"

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def df(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch)

  private def dvTable(): GraftTable =
    GraftTable.create(spark, tmp(), sch,
      options = Map("deletion-vectors.enabled" -> "true"))

  test("delete marks positions; data files are not rewritten") {
    val t = dvTable()
    t.write(df((0L until 10L).map(i => (i, s"v$i")): _*))
    val filesBefore = t.systemFiles.select("file_name").collect().map(_.getString(0)).toSet
    t.delete(col("k") % 2 === 0)
    val filesAfter = t.systemFiles.select("file_name").collect().map(_.getString(0)).toSet
    assert(filesAfter == filesBefore, "DV delete must keep the same data files")
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 5L, 7L, 9L))
    assert(t.countRows() == 5L)
    // second delete on the same file merges bitmaps
    t.delete(col("k") === 1L)
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 5L, 7L, 9L))
    assert(t.countRows() == 4L)
  }

  test("fully-deleted file is dropped from the manifest") {
    val t = dvTable()
    t.write(df((1L, "a")))
    t.write(df((2L, "b")))
    t.delete(col("k") === 1L)
    assert(t.systemFiles.count() == 1)
    assert(t.read.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("a delete spanning many files builds every sidecar executor-side") {
    val t = dvTable()
    // 25 commits → 25 files, all touched by one predicate
    (0 until 25).foreach(i =>
      t.write(df((0L until 20L).map(j => (i * 20L + j, s"v$i-$j")): _*).coalesce(1)))
    assert(t.systemFiles.count() == 25)
    t.delete(col("k") % 2 === 0) // hits every file
    assert(t.countRows() == 250L)
    assert(t.read.count() == 250L)
    assert(t.read.filter(col("k") % 2 === 0).count() == 0)
    // every surviving file carries a DV sidecar; none was dropped
    assert(t.systemFiles.count() == 25)
    val live = t.sm.latestSnapshot().map(t.sm.liveEntries).get
    assert(live.forall(_.file.dvFile.isDefined))
    assert(live.forall(_.file.dvCardinality.contains(10L)))
    // a second overlapping delete merges with the existing sidecars
    t.delete(col("k") % 4 === 1)
    assert(t.read.count() == 125L)
  }

  test("update = DV mark + append, one commit; compaction drops DVs") {
    val t = dvTable()
    t.write(df((1L, "a"), (2L, "b"), (3L, "c")))
    val snaps = t.systemSnapshots.count()
    t.update(Map("v" -> lit("B")), col("k") === 2L)
    assert(t.systemSnapshots.count() == snaps + 1)
    val got = t.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // compaction materializes the DVs away
    t.compact()
    assert(t.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    assert(t.systemFiles.count() >= 1)
    // time travel before the update still sees the original value
    assert(t.versionAsOf(0L).filter(col("k") === 2L).head.getString(1) == "b")
  }
}
