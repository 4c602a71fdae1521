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

  test("data evolution: patchColumn backfills without rewriting files") {
    import spark.implicits._
    val t = rtTable()
    t.write(df1((0L, "a"), (1L, "b")))
    t.write(df1((2L, "c")))
    val filesBefore = t.read.inputFiles.toSet
    // backfill a NEW column for a subset of rows (by _ROW_ID)
    t.patchColumn("score", Seq((0L, 10.5), (2L, 30.5))
      .toDF(GraftTable.RowIdCol, "score"))
    val got = t.read.orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.get(2)))).toSeq
    assert(got == Seq((0L, Some(10.5)), (1L, None), (2L, Some(30.5))), got.toString)
    // zero data files rewritten
    assert(t.read.inputFiles.toSet.intersect(filesBefore) == filesBefore)
    // a later patch WINS per row id; untouched ids keep their patch
    t.patchColumn("score", Seq((0L, 99.0)).toDF(GraftTable.RowIdCol, "score"))
    val got2 = t.read.orderBy("k").collect().map(r => Option(r.get(2))).toSeq
    assert(got2 == Seq(Some(99.0), None, Some(30.5)), got2.toString)
    // patching an EXISTING column overlays — including an explicit null
    t.patchColumn("v", Seq((1L, "patched"), (0L, null.asInstanceOf[String]))
      .toDF(GraftTable.RowIdCol, "v"))
    val vs = t.read.orderBy("k").collect().map(r => Option(r.getString(1))).toSeq
    assert(vs == Seq(None, Some("patched"), Some("c")), vs.toString)
    // time travel: the pre-patch snapshot reads the original values
    assert(t.versionAsOf(1L).orderBy("k").collect()
      .map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    // row-id reads see the overlay too
    assert(t.readRowRange(1L, 2L).head.getString(1) == "patched")
    // duplicate row ids in ONE call are rejected up front — they would
    // share a patch generation and tie-break nondeterministically
    val dup = intercept[IllegalArgumentException](t.patchColumn("score",
      Seq((0L, 1.0), (0L, 2.0)).toDF(GraftTable.RowIdCol, "score")))
    assert(dup.getMessage.contains("duplicate"))
  }

  test("data evolution: tags stay immutable; top-N and text search see patches") {
    import spark.implicits._
    val t = rtTable()
    t.write(df1((0L, "alpha words"), (1L, "beta words")))
    t.createTag("pre")
    t.patchColumn("v", Seq((0L, "gamma text")).toDF(GraftTable.RowIdCol, "v"))
    // the tag reads ITS OWN patch registry (none), not today's
    assert(t.readTag("pre").orderBy("k").collect().map(_.getString(1)).toSeq
      == Seq("alpha words", "beta words"))
    assert(t.read.orderBy("k").collect().map(_.getString(1)).toSeq
      == Seq("gamma text", "beta words"))
    // a patched value outside stored stats must win the top-1
    val nt = GraftTable.create(spark, tmp(), StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n", LongType, nullable = true))),
      options = Map(GraftTable.RowTrackingEnabled -> "true"))
    nt.write(spark.createDataFrame(Seq(Row(0L, 1L), Row(1L, 2L)).asJava,
      nt.schema.toStruct).coalesce(1))
    nt.write(spark.createDataFrame(Seq(Row(2L, 50L)).asJava,
      nt.schema.toStruct).coalesce(1))
    nt.patchColumn("n", Seq((0L, 1000L)).toDF(GraftTable.RowIdCol, "n"))
    assert(nt.readTopN("n", 1).head.getLong(1) == 1000L)
    // a text-indexed patched column fails OPEN: the patched row is found
    val tt = rtTable()
    tt.write(df1((0L, "quiet filler"), (1L, "other filler")))
    tt.rebuildTextIndex("v")
    tt.patchColumn("v", Seq((0L, "needle content")).toDF(GraftTable.RowIdCol, "v"))
    assert(tt.searchText("v", "needle").collect().map(_.getLong(0)).toSeq == Seq(0L))
    // dotted names are rejected up front (nested-path ambiguity)
    intercept[IllegalArgumentException](
      tt.patchColumn("a.b", Seq((0L, "x")).toDF(GraftTable.RowIdCol, "a.b")))
  }

  test("data evolution: orphaned patch generations are swept") {
    import spark.implicits._
    val t = rtTable()
    t.write(df1((0L, "a")))
    t.patchColumn("score", Seq((0L, 1.0)).toDF(GraftTable.RowIdCol, "score"))
    // simulate a crashed writer: a patch dir that no snapshot registers
    val orphanDir = java.nio.file.Paths.get(s"${t.path}/patch/orphan-gen")
    Files.createDirectories(orphanDir)
    Files.write(orphanDir.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    val removed = t.removeOrphanFiles(graceMillis = 0L)
    assert(removed.exists(_.contains("orphan-gen")), removed.toString)
    // the REGISTERED generation survives and reads stay correct
    assert(t.read.head.getDouble(2) == 1.0)
  }

  test("data evolution: stats pruning never drops patched rows; DVs compose") {
    import spark.implicits._
    val nsch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n", LongType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), nsch,
      options = Map(GraftTable.RowTrackingEnabled -> "true",
        graft.core.DeletionVectors.OptionEnabled -> "true"))
    t.write(spark.createDataFrame(
      Seq(Row(0L, 1L), Row(1L, 2L)).asJava, nsch).coalesce(1))
    t.write(spark.createDataFrame(
      Seq(Row(2L, 3L), Row(3L, 4L)).asJava, nsch).coalesce(1))
    // patch n of row 0 far beyond the stored stats range
    t.patchColumn("n", Seq((0L, 1000L)).toDF(GraftTable.RowIdCol, "n"))
    // stored stats say max(n)=2 for file 1 — pruning on n must not
    // drop it, the patched row matches
    val hit = t.scan(col("n") > 100L).collect()
    assert(hit.length == 1 && hit.head.getLong(0) == 0L, hit.toSeq.toString)
    // a DV delete composes: row ids stay stable, patches still apply
    t.delete(col("k") === 1L)
    assert(t.read.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((0L, 1000L), (2L, 3L), (3L, 4L)))
  }

  test("data evolution through SQL: fallback plan, no stale stats aggregates") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_rt.pdb")
    spark.sql(s"""CREATE TABLE graft_rt.pdb.t (k BIGINT, n BIGINT)
      TBLPROPERTIES ('${GraftTable.RowTrackingEnabled}'='true')""")
    spark.sql("INSERT INTO graft_rt.pdb.t VALUES (0, 1), (1, 2)")
    val gt = GraftTable.load(spark, s"$warehouse/pdb/t")
    // resolve k=0's ROW ID first — id order follows file-name order,
    // not key order
    val rid0 = spark.sql("SELECT _ROW_ID FROM graft_rt.pdb.t WHERE k = 0")
      .head.getLong(0)
    gt.patchColumn("n", Seq((rid0, 500L)).toDF(GraftTable.RowIdCol, "n"))
    // SQL sees the overlay (native scan would read raw files)
    assert(spark.sql("SELECT n FROM graft_rt.pdb.t WHERE k = 0").head.getLong(0) == 500L)
    // MIN/MAX must NOT answer from (stale) manifest stats
    assert(spark.sql("SELECT max(n) FROM graft_rt.pdb.t").head.getLong(0) == 500L)
    assert(spark.sql("SELECT count(*) FROM graft_rt.pdb.t").head.getLong(0) == 2L)
    // generations fold to one through the procedure; reads unchanged
    import spark.implicits._
    gt.patchColumn("n", Seq((rid0, 700L)).toDF(GraftTable.RowIdCol, "n"))
    val res = spark.sql(
      "CALL graft_rt.sys.compact_column_patches('pdb.t', 'n')").head.getString(0)
    assert(res.contains("compacted"), res)
    val gt2 = GraftTable.load(spark, s"$warehouse/pdb/t")
    assert(gt2.sm.latestSnapshot().get.colPatches.get("n")
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct.size == 1)
    assert(spark.sql("SELECT n FROM graft_rt.pdb.t WHERE k = 0").head.getLong(0) == 700L)
    assert(spark.sql(
      "CALL graft_rt.sys.compact_column_patches('pdb.t', 'n')").head.getString(0)
      .contains("nothing"))
  }
}
