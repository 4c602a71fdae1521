package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Row tracking: stable `_ROW_ID` = file firstRowId + physical
  * position (reference: paimon row tracking — SpecialFields._ROW_ID,
  * Snapshot.nextRowId, DataFileMeta.firstRowId; row-range reads of
  * ReadBuilder). */
class RowTrackingSpec extends AnyFunSuite {

  lazy val warehouse: String = Files.createTempDirectory("graft-rt-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.graft_rt", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.graft_rt.warehouse", warehouse)
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-rt").toString + "/t"

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  /** single-partition DataFrame → exactly one file, rows in seq order */
  private def df1(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch).coalesce(1)

  private def rtTable(extra: Map[String, String] = Map.empty): GraftTable =
    GraftTable.create(spark, tmp(), sch,
      options = Map(GraftTable.RowTrackingEnabled -> "true") ++ extra)

  test("ids are dense, insertion-ordered, persisted across commits") {
    val t = rtTable()
    t.write(df1((0L until 5L).map(i => (i, s"a$i")): _*))
    t.write(df1((5L until 8L).map(i => (i, s"b$i")): _*))
    t.write(df1((8L until 10L).map(i => (i, s"c$i")): _*))
    val got = t.readWithRowIds().select("k", GraftTable.RowIdCol)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == (0L until 10L).map(i => (i, i)))
    assert(t.sm.latestSnapshot().get.nextRowId.contains(10L))
    // reload from disk: assignment is in the manifests, not in memory
    val t2 = GraftTable.load(spark, t.path)
    assert(t2.readWithRowIds().select(GraftTable.RowIdCol)
      .collect().map(_.getLong(0)).sorted.toSeq == (0L until 10L))
  }

  test("deletes keep survivor ids stable and never reuse retired ids") {
    val t = rtTable(Map("deletion-vectors.enabled" -> "true"))
    t.write(df1((0L until 10L).map(i => (i, s"v$i")): _*))
    t.delete(col("k") % 2 === 0)
    val after = t.readWithRowIds().select("k", GraftTable.RowIdCol)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // odd keys survive with their ORIGINAL ids (positions never shift)
    assert(after.toSeq == Seq(1L -> 1L, 3L -> 3L, 5L -> 5L, 7L -> 7L, 9L -> 9L))
    // new rows start at nextRowId: deleted ids 0,2,4,6,8 are retired
    t.write(df1((100L, "x")))
    val ids = t.readWithRowIds().select(GraftTable.RowIdCol)
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 3L, 5L, 7L, 9L, 10L))
  }

  test("row-range read prunes files by id extent") {
    val t = rtTable()
    (0 until 3).foreach(c =>
      t.write(df1((0L until 100L).map(i => (c * 100L + i, "v")): _*)))
    // [120, 180) lies inside the second file only
    assert(t.rowRangeEntries(120L, 180L).size == 1)
    // straddling [90, 110) touches exactly two of three
    assert(t.rowRangeEntries(90L, 110L).size == 2)
    val got = t.readRowRange(120L, 180L)
      .select("k", GraftTable.RowIdCol).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    assert(got.toSeq == (120L until 180L).map(i => (i, i)))
    // empty window → zero files, zero rows
    assert(t.rowRangeEntries(300L, 400L).isEmpty)
    assert(t.readRowRange(300L, 400L).count() == 0L)
  }

  test("INSERT OVERWRITE retires replaced ids; fresh files continue the counter") {
    val t = rtTable()
    t.write(df1((0L until 4L).map(i => (i, "old")): _*))
    t.overwrite(df1((100L, "new"), (101L, "new")))
    val got = t.readWithRowIds().select("k", GraftTable.RowIdCol)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq(100L -> 4L, 101L -> 5L))
    assert(t.sm.latestSnapshot().get.nextRowId.contains(6L))
  }

  test("SQL: _ROW_ID metadata column with range predicates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_rt.rt")
    spark.sql(
      """CREATE TABLE graft_rt.rt.ev (k BIGINT, v STRING)
        |TBLPROPERTIES ('row-tracking.enabled'='true')""".stripMargin)
    spark.sql("INSERT INTO graft_rt.rt.ev SELECT id, 'a' FROM range(0, 50, 1, 1)")
    spark.sql("INSERT INTO graft_rt.rt.ev SELECT id, 'b' FROM range(50, 100, 1, 1)")
    assert(spark.sql("SELECT max(_ROW_ID) FROM graft_rt.rt.ev").head.getLong(0) == 99L)
    val sliced = spark.sql(
      "SELECT k, _ROW_ID FROM graft_rt.rt.ev WHERE _ROW_ID >= 45 AND _ROW_ID < 55 ORDER BY _ROW_ID")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sliced.toSeq == (45L until 55L).map(i => (i, i)))
    // plain reads (no _ROW_ID reference) still take the native scan
    assert(spark.sql("SELECT count(*) FROM graft_rt.rt.ev WHERE k < 10").head.getLong(0) == 10L)
    spark.sql("DROP TABLE graft_rt.rt.ev")
  }

  test("operations that would reassign ids are refused") {
    val t = rtTable()
    t.write(df1((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException](t.compact())
    intercept[IllegalArgumentException](t.sortCompact("zorder", Seq("k")))
    // COW row-level delete without deletion vectors would rewrite files
    intercept[IllegalArgumentException](t.delete(col("k") === 1L))
    intercept[IllegalArgumentException](
      t.setOption(GraftTable.RowTrackingEnabled, "false"))
    intercept[IllegalArgumentException](
      GraftTable.create(spark, tmp(), sch, primaryKeys = Seq("k"),
        options = Map(GraftTable.RowTrackingEnabled -> "true")))
  }

  test("concurrent committers are assigned disjoint id ranges") {
    val t = rtTable()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = (0 until 4).map { w =>
      Future {
        val mine = GraftTable.load(spark, t.path)
        mine.write(df1((0L until 50L).map(i => (w * 1000L + i, s"w$w")): _*))
      }
    }
    Await.result(Future.sequence(writes), 120.seconds)
    val ids = t.readWithRowIds().select(GraftTable.RowIdCol)
      .collect().map(_.getLong(0)).sorted
    // CAS loop re-assigns from the winner's nextRowId: dense, disjoint
    assert(ids.toSeq == (0L until 200L))
    assert(t.sm.latestSnapshot().get.nextRowId.contains(200L))
  }

  test("time travel reads historical ids unchanged") {
    val t = rtTable()
    val s0 = t.write(df1((1L, "a")))
    t.write(df1((2L, "b")))
    val old = t.readWithRowIds(Some(s0))
      .select("k", GraftTable.RowIdCol).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(old.toSeq == Seq(1L -> 0L))
  }
}
