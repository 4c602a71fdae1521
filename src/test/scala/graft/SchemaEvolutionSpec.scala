package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Schema evolution: rename / drop / widen with field-id mapping so
  * files written under earlier schema versions read correctly through
  * the current one (reference: SchemaManager SchemaChange set +
  * SchemaEvolutionUtil / CastExecutors; exercised by the reference's
  * SchemaEvolutionTest / DDLTestBase).
  */
class SchemaEvolutionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-evo").toString + "/t"

  import scala.jdk.CollectionConverters._

  private val v1Schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("amount", IntegerType, nullable = true),
    StructField("note", StringType, nullable = true)))

  private def v1Df(rows: (Long, java.lang.Integer, String)*): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, v1Schema)

  test("rename: old files read through the new column name") {
    val t = GraftTable.create(spark, tmp(), v1Schema)
    t.write(v1Df((1L, 10, "a")))
    t.renameColumn("note", "comment")
    val t2 = GraftTable.load(spark, t.path)
    t2.write(spark.createDataFrame(
      Seq(Row(2L, 20, "b")).asJava,
      StructType(v1Schema.fields.map(f =>
        if (f.name == "note") f.copy(name = "comment") else f))))
    val got = t2.read.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 10, "a"), (2L, 20, "b")))
    assert(t2.read.columns.toSeq == Seq("k", "amount", "comment"))
    // stats pruning works across the rename (old file stats remapped)
    assert(t2.scan(col("comment") === "a").count() == 1)
  }

  test("widen: int -> long with old files cast up; stats pruning intact") {
    val t = GraftTable.create(spark, tmp(), v1Schema)
    t.write(v1Df((1L, 100, "a"), (2L, 200, "b")))
    t.widenColumn("amount", LongType)
    val t2 = GraftTable.load(spark, t.path)
    val widened = StructType(v1Schema.fields.map(f =>
      if (f.name == "amount") f.copy(dataType = LongType) else f))
    t2.write(spark.createDataFrame(
      Seq(Row(3L, 3000000000L, "c")).asJava, widened)) // > Int.MaxValue
    assert(t2.read.schema("amount").dataType == LongType)
    assert(t2.read.select(sum("amount")).head.getLong(0) == 3000000300L)
    // pruning on the widened column still skips: value 100 only in file 1
    assert(t2.scan(col("amount") === 100L).inputFiles.length == 1)
  }

  test("drop: removed column disappears; unrelated data survives") {
    val t = GraftTable.create(spark, tmp(), v1Schema)
    t.write(v1Df((1L, 10, "a")))
    t.dropColumn("note")
    val t2 = GraftTable.load(spark, t.path)
    assert(t2.read.columns.toSeq == Seq("k", "amount"))
    t2.write(spark.createDataFrame(
      Seq(Row(2L, 20)).asJava,
      StructType(v1Schema.fields.filterNot(_.name == "note"))))
    val got = t2.read.orderBy("k").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((1L, 10), (2L, 20)))
  }

  test("add after rename: field ids keep old/new columns distinct") {
    val t = GraftTable.create(spark, tmp(), v1Schema)
    t.write(v1Df((1L, 10, "a")))
    t.renameColumn("note", "comment")
    GraftTable.load(spark, t.path).addColumn("note", StringType) // reuse old NAME
    val t3 = GraftTable.load(spark, t.path)
    val row = t3.read.head
    // old file's physical "note" maps to "comment" (same id); the NEW
    // "note" (fresh id) reads null from old files
    assert(row.getString(t3.read.columns.indexOf("comment")) == "a")
    assert(row.isNullAt(t3.read.columns.indexOf("note")))
  }

  test("pk table: evolution composes with merge-on-read") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", IntegerType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq", "bucket" -> "2"))
    t.write(spark.createDataFrame(
      Seq(Row(1L, 10, 1L), Row(2L, 20, 1L)).asJava, sch))
    t.widenColumn("v", LongType)
    t.renameColumn("v", "value")
    val t2 = GraftTable.load(spark, t.path)
    val evolved = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("value", LongType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    t2.write(spark.createDataFrame(
      Seq(Row(1L, 5000000000L, 2L)).asJava, evolved)) // upsert k=1
    val got = t2.read.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 5000000000L), (2L, 20L)))
    // compaction rewrites everything under the current schema
    t2.compact()
    val t3 = GraftTable.load(spark, t.path)
    assert(t3.read.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 5000000000L), (2L, 20L)))
  }

  test("column default values substitute nulls at write time") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = true)))
    // append table: nulls land as the defaults, values pass through
    val t = GraftTable.create(spark, tmp(), sch, options = Map(
      "fields.s.default-value" -> "none",
      "fields.n.default-value" -> "0"))
    t.write(spark.createDataFrame(
      Seq(Row(1L, null, null), Row(2L, "x", 7L)).asJava, sch))
    assert(t.read.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      == Seq((1L, "none", 0L), (2L, "x", 7L)))
    // PK upsert path applies them too; a column WITHOUT a default keeps null
    val t2 = GraftTable.create(spark, tmp(), sch, primaryKeys = Seq("k"),
      options = Map("fields.s.default-value" -> "none"))
    t2.write(spark.createDataFrame(Seq(Row(5L, null, null)).asJava, sch))
    val r = t2.read.head
    assert(r.getString(1) == "none" && r.isNullAt(2))
    // a default added LATER (setOption) applies to subsequent writes only
    t2.setOption("fields.n.default-value", "42")
    t2.write(spark.createDataFrame(Seq(Row(6L, "y", null)).asJava, sch))
    val rows = t2.read.orderBy("k").collect()
    assert(rows(0).isNullAt(2) && rows(1).getLong(2) == 42L)
  }

  test("nested add/drop: struct fields evolve, old files align by name") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("s", StructType(Seq(
        StructField("a", LongType, nullable = true),
        StructField("b", StringType, nullable = true))), nullable = true)))
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(spark.createDataFrame(
      Seq(Row(1L, Row(10L, "x")), Row(2L, null)).asJava, sch))
    // add a nested field: old rows read it as null, null structs stay null
    t.addColumn("s.c", IntegerType)
    val t2 = GraftTable.load(spark, t.path)
    val sch2 = t2.schema.toStruct
    assert(sch2("s").dataType.asInstanceOf[StructType].fieldNames.toSeq
      == Seq("a", "b", "c"))
    t2.write(spark.createDataFrame(Seq(Row(3L, Row(30L, "z", 7))).asJava, sch2))
    val rows = t2.read.orderBy("k").collect()
    assert(rows(0).getStruct(1).getLong(0) == 10L &&
      rows(0).getStruct(1).getString(1) == "x" &&
      rows(0).getStruct(1).isNullAt(2), rows(0).toString)
    assert(rows(1).isNullAt(1), "null struct must stay null, not struct-of-nulls")
    assert(rows(2).getStruct(1).getInt(2) == 7)
    // drop a nested field: projected away from EVERY file
    t2.dropColumn("s.b")
    val t3 = GraftTable.load(spark, t.path)
    assert(t3.schema.toStruct("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("a", "c"))
    val r3 = t3.read.orderBy("k").collect()
    assert(r3(0).getStruct(1).getLong(0) == 10L && r3(0).getStruct(1).isNullAt(1))
    assert(r3(2).getStruct(1).getInt(1) == 7)
    // illegal nested changes fail loudly
    intercept[IllegalArgumentException](t3.addColumn("s.a", LongType))  // exists
    intercept[IllegalArgumentException](t3.dropColumn("s.nope"))
    intercept[IllegalArgumentException](t3.addColumn("k.x", LongType))  // not a struct
    intercept[IllegalArgumentException](t3.renameColumn("s.a", "s.z"))
    intercept[IllegalArgumentException](t3.widenColumn("s.a", DoubleType))
    // a PK table merges correctly across the nested evolution
    val pt = GraftTable.create(spark, tmp(), sch, primaryKeys = Seq("k"))
    pt.write(spark.createDataFrame(Seq(Row(1L, Row(1L, "old"))).asJava, sch))
    pt.addColumn("s.c", IntegerType)
    val pt2 = GraftTable.load(spark, pt.path)
    val psch2 = pt2.schema.toStruct
    pt2.write(spark.createDataFrame(Seq(Row(1L, Row(2L, "new", 9))).asJava, psch2))
    val merged = pt2.read.collect()
    assert(merged.length == 1 && merged(0).getStruct(1).getInt(2) == 9)
  }

  test("defaults never substitute under partial-update/aggregation engines") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("y",
        org.apache.spark.sql.types.LongType, nullable = true)))
    // partial-update: null means "keep the stored value" — a default
    // substituted at write time would clobber x=5 with 0
    val t = GraftTable.create(spark, tmp(), sch, primaryKeys = Seq("k"),
      options = Map("merge-engine" -> "partial-update",
        "fields.x.default-value" -> "0"))
    t.write(spark.createDataFrame(Seq(Row(1L, 5L, null)).asJava, sch))
    t.write(spark.createDataFrame(Seq(Row(1L, null, 7L)).asJava, sch))
    val r = t.read.head
    assert(r.getLong(1) == 5L && r.getLong(2) == 7L)
    // aggregation: null contributes nothing — a default of 5 must not
    // be added to the sum on the null-x upsert
    val t2 = GraftTable.create(spark, tmp(), sch, primaryKeys = Seq("k"),
      options = Map("merge-engine" -> "aggregation",
        "fields.x.aggregate-function" -> "sum",
        "fields.y.aggregate-function" -> "sum",
        "fields.x.default-value" -> "5"))
    t2.write(spark.createDataFrame(Seq(Row(1L, 10L, 1L)).asJava, sch))
    t2.write(spark.createDataFrame(Seq(Row(1L, null, 1L)).asJava, sch))
    val r2 = t2.read.head
    assert(r2.getLong(1) == 10L && r2.getLong(2) == 2L)
  }

  test("illegal evolutions are rejected") {
    val t = GraftTable.create(spark, tmp(), v1Schema, partitionKeys = Seq("note"))
    t.write(v1Df((1L, 10, "a")))
    intercept[IllegalArgumentException](t.renameColumn("note", "n2"))
    intercept[IllegalArgumentException](t.dropColumn("note"))
    intercept[IllegalArgumentException](t.widenColumn("amount", ByteType))
    intercept[IllegalArgumentException](t.widenColumn("k", IntegerType))
  }

  test("ALTER COLUMN nullability: relax always, tighten only when opted in") {
    val wh = java.nio.file.Files.createTempDirectory("graft-null-wh").toString
    spark.conf.set("spark.sql.catalog.graftnul", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftnul.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftnul.d")
    spark.sql("CREATE TABLE graftnul.d.t (k BIGINT NOT NULL, v STRING)")
    // relax NOT NULL -> nullable: always allowed
    spark.sql("ALTER TABLE graftnul.d.t ALTER COLUMN k DROP NOT NULL")
    val gt = graft.table.GraftTable.load(spark, s"$wh/d/t")
    assert(gt.schema.fields.find(_.name == "k").get.nullable)
    // tighten via SQL: Spark's own analyzer rejects it before the
    // catalog is consulted — the option gates the LIBRARY surface
    intercept[Exception](
      spark.sql("ALTER TABLE graftnul.d.t ALTER COLUMN v SET NOT NULL"))
    // library path without the opt-in: rejected (reference posture)
    val e = intercept[Exception](
      gt.setColumnNullabilityAt(Seq("v"), nullable = false))
    assert(e.toString.contains("null-to-not-null"), e.toString)
    // opted in: allowed
    spark.sql("ALTER TABLE graftnul.d.t SET TBLPROPERTIES " +
      "('alter-column-null-to-not-null.disabled'='false')")
    graft.table.GraftTable.load(spark, s"$wh/d/t")
      .setColumnNullabilityAt(Seq("v"), nullable = false)
    assert(!graft.table.GraftTable.load(spark, s"$wh/d/t")
      .schema.fields.find(_.name == "v").get.nullable)
  }
}
