package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Maintenance operators: sort-compact (z-order/order), rollback,
  * schema evolution. */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-maint").toString + "/t"

  private val xy = StructType(Seq(
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false)))

  private def grid(n: Int): DataFrame = {
    import spark.implicits._
    // row-major order: x-runs are clustered, y is scattered
    (0 until n).flatMap(y => (0 until n).map(x => (x.toLong, y.toLong)))
      .toDF("x", "y")
  }

  test("z-order sort-compact tightens file stats on both dimensions") {
    val t = GraftTable.create(spark, tmp(), xy)
    // write row-major in 8 slices: y is clustered per file, x is not
    val g = grid(64)
    (0 until 8).foreach(i => t.write(g.filter(col("y") % 8 === i)))
    val filesBefore = t.scan(col("x") < 8 && col("y") < 8).inputFiles.length
    t.sortCompact("zorder", Seq("x", "y"), targetFiles = 8)
    // data preserved
    assert(t.read.count() == 64L * 64)
    assert(t.read.agg(sum(col("x") + col("y") * 64)).head.getLong(0) ==
      (0L until 64L * 64L).sum)
    // a corner-box query must now touch fewer files than dimensions × slices
    val filesAfter = t.scan(col("x") < 8 && col("y") < 8).inputFiles.length
    assert(filesAfter < filesBefore,
      s"expected pruning to improve: before=$filesBefore after=$filesAfter")
    assert(t.scan(col("x") < 8 && col("y") < 8).count() == 64)
  }

  test("order sort-compact clusters lexicographically") {
    val t = GraftTable.create(spark, tmp(), xy)
    (0 until 4).foreach(i => t.write(grid(32).filter(col("x") % 4 === i)))
    t.sortCompact("order", Seq("x"), targetFiles = 4)
    assert(t.read.count() == 32L * 32)
    assert(t.scan(col("x") === 5).inputFiles.length == 1)
  }

  test("rollback discards later snapshots and their files") {
    val sch = StructType(Seq(StructField("k", LongType, nullable = false)))
    def df(v: Long*) = spark.createDataFrame(v.map(Row(_)).asJava, sch)
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df(1, 2))
    t.write(df(3))
    t.write(df(4))
    assert(t.read.count() == 4)
    t.rollback(0L)
    assert(t.read.count() == 2)
    assert(t.sm.latestSnapshotId.contains(0L))
    // a new write continues from the rolled-back state
    t.write(df(9))
    assert(t.read.count() == 3)
    assert(t.sm.latestSnapshotId.contains(1L))
  }

  test("schema evolution: added column reads null from old files") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    def df(rows: (Long, String)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch)
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df((1L, "a")))
    t.addColumn("score", DoubleType)
    val t2 = GraftTable.load(spark, t.path)
    // new writes carry the new column; old files surface null
    t2.write(spark.createDataFrame(
      Seq(Row(2L, "b", 0.5)).asJava, t2.schema.toStruct))
    val got = t2.read.orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq((1L, None), (2L, Some(0.5))))
    assert(t2.schema.id == 1L)
  }
}
