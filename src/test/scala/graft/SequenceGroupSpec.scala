package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Partial-update sequence groups and nested_update aggregates
  * (reference: PartialUpdateMergeFunction.java:67-162 sequence-group
  * handling, FieldNestedUpdateAgg.java:46).
  */
class SequenceGroupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-seqgrp").toString + "/t"

  import scala.jdk.CollectionConverters._

  // k | a, sa (group 1) | b, sb (group 2)
  private val sgSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("a", StringType, nullable = true),
    StructField("sa", LongType, nullable = true),
    StructField("b", StringType, nullable = true),
    StructField("sb", LongType, nullable = true)))

  private def sgDf(rows: (Long, String, java.lang.Long, String, java.lang.Long)*): DataFrame =
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4, r._5)).asJava, sgSchema)

  private def sgTable(): GraftTable =
    GraftTable.create(spark, tmp(), sgSchema,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "partial-update",
        "fields.sa.sequence-group" -> "a",
        "fields.sb.sequence-group" -> "b",
        "bucket" -> "2"))

  test("groups update independently, out-of-order per group") {
    val t = sgTable()
    t.write(sgDf((1L, "a1", 2L, "b1", 1L)))
    // sa=1 < current 2 → group a NOT updated; sb=2 >= 1 → group b updated
    t.write(sgDf((1L, "aX", 1L, "b2", 2L)))
    val r = t.read.head
    assert(r.getString(1) == "a1" && r.getLong(2) == 2L)
    assert(r.getString(3) == "b2" && r.getLong(4) == 2L)
  }

  test("a null group-sequence skips the group; equal sequence lets later write win") {
    val t = sgTable()
    t.write(sgDf((1L, "a1", 5L, "b1", 5L)))
    // null sa → group a untouched even though a has a value
    t.write(sgDf((1L, "ghost", null, "b2", 5L))) // sb equal → later wins
    val r = t.read.head
    assert(r.getString(1) == "a1")
    assert(r.getString(3) == "b2")
  }

  test("a newer record's null member overwrites inside its group") {
    val t = sgTable()
    t.write(sgDf((1L, "a1", 1L, "b1", 1L)))
    t.write(sgDf((1L, null, 2L, "b1", 1L))) // group a advances with null a
    val r = t.read.head
    assert(r.isNullAt(1) && r.getLong(2) == 2L)
    assert(r.getString(3) == "b1")
  }

  test("retract with newer group sequence nulls that group only") {
    val t = sgTable()
    t.write(sgDf((1L, "a1", 1L, "b1", 1L)))
    val retract = sgDf((1L, "a1", 2L, null, null))
      .withColumn(graft.core.Meta.KindCol,
        lit(graft.core.Meta.KindDelete).cast("byte"))
    t.writeKinded(retract)
    val r = t.read.head
    assert(r.isNullAt(1), "group a member must be retracted")
    assert(r.getString(3) == "b1", "group b untouched")
  }

  test("remove-record-on-sequence-group: a -D winning the configured " +
    "group deletes the whole row; other groups' -D only retracts members") {
    // mirrors the reference's PartialUpdateMergeFunctionTest
    // .testSequenceGroupPartialDelete shape: group sa protects a,
    // group sb protects b, only sb is a partial-delete group
    def mk(): GraftTable = GraftTable.create(spark, tmp(), sgSchema,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "partial-update",
        "fields.sa.sequence-group" -> "a",
        "fields.sb.sequence-group" -> "b",
        "partial-update.remove-record-on-sequence-group" -> "sb",
        "bucket" -> "2"))
    def del(t: GraftTable, rows: (Long, String, java.lang.Long, String, java.lang.Long)*): Unit =
      t.writeKinded(sgDf(rows: _*).withColumn(graft.core.Meta.KindCol,
        lit(graft.core.Meta.KindDelete).cast("byte")))
    // -D winning the NON-configured group (sa) retracts only group a
    val t1 = mk()
    t1.write(sgDf((1L, "a1", 1L, "b1", 1L)))
    del(t1, (1L, null, 2L, null, null)) // sb null -> skips group b
    val r1 = t1.read.head
    assert(r1.isNullAt(1) && r1.getString(3) == "b1", "only group a retracted")
    // -D winning the CONFIGURED group (sb) deletes the whole row
    val t2 = mk()
    t2.write(sgDf((1L, "a1", 1L, "b1", 1L)))
    del(t2, (1L, null, null, null, 2L))
    assert(t2.read.filter(col("k") === 1L).count() == 0, "row must be deleted")
    // ... but a LOSING -D (older sb) does not
    val t3 = mk()
    t3.write(sgDf((1L, "a1", 1L, "b1", 5L)))
    del(t3, (1L, null, null, null, 2L))
    assert(t3.read.filter(col("k") === 1L).count() == 1, "losing -D must not delete")
    // a later insert with a NEWER configured-group sequence resurrects
    val t4 = mk()
    t4.write(sgDf((1L, "a1", 1L, "b1", 1L)))
    del(t4, (1L, null, null, null, 2L))
    t4.write(sgDf((1L, "a2", 2L, "b2", 3L)))
    val r4 = t4.read.filter(col("k") === 1L).head
    assert(r4.getString(1) == "a2" && r4.getString(3) == "b2")
    // option validation: the configured field must be a group sequence
    val bad = intercept[Exception] {
      val t = GraftTable.create(spark, tmp(), sgSchema,
        primaryKeys = Seq("k"),
        options = Map(
          "merge-engine" -> "partial-update",
          "fields.sa.sequence-group" -> "a",
          "partial-update.remove-record-on-sequence-group" -> "b",
          "bucket" -> "1"))
      t.write(sgDf((1L, "a1", 1L, null, null)))
      t.read.count()
    }
    assert(bad.getMessage.contains("sequence group"), bad.getMessage)
  }

  test("key with only retracts never materializes") {
    val t = sgTable()
    val retract = sgDf((7L, "x", 1L, null, null))
      .withColumn(graft.core.Meta.KindCol,
        lit(graft.core.Meta.KindDelete).cast("byte"))
    t.writeKinded(retract)
    assert(t.read.filter(col("k") === 7L).count() == 0)
  }

  test("multi-column sequence group orders lexicographically") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("s1", LongType, nullable = true),
      StructField("s2", LongType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "partial-update",
        "fields.s1,s2.sequence-group" -> "v"))
    def df(rows: (Long, String, Long, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, sch)
    t.write(df((1L, "v1", 1L, 5L)))
    t.write(df((1L, "v2", 1L, 4L))) // (1,4) < (1,5) → loses
    assert(t.read.head.getString(1) == "v1")
    t.write(df((1L, "v3", 2L, 0L))) // (2,0) > (1,5) → wins
    assert(t.read.head.getString(1) == "v3")
  }

  test("plain partial-update ignores -U retractions: no overwrite, no resurrect") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map("merge-engine" -> "partial-update"))
    def df(rows: (Long, String)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2)).asJava, sch)
    t.write(df((1L, "v1")))
    // an unpaired -U (CDC pk-change leftover): BOTH retraction kinds
    // must be ignored — feeding it to the last-non-null fold would
    // overwrite v1 with the RETRACTED value stamped +I
    val ub = df((1L, "stale")).withColumn(graft.core.Meta.KindCol,
      lit(graft.core.Meta.KindUpdateBefore).cast("byte"))
    t.writeKinded(ub)
    val got = t.read.collect()
    assert(got.length == 1 && got.head.getString(1) == "v1", got.mkString(","))
    // a key fed ONLY -U records never materializes
    t.writeKinded(df((2L, "ghost")).withColumn(graft.core.Meta.KindCol,
      lit(graft.core.Meta.KindUpdateBefore).cast("byte")))
    assert(t.read.filter(col("k") === 2L).count() == 0)
  }

  test("merge_map folds maps in order; later value wins per key") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("m", MapType(StringType, StringType), nullable = true)))
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map("merge-engine" -> "aggregation",
        "fields.m.aggregate-function" -> "merge_map"))
    def df(m: Map[String, String]) = spark.createDataFrame(
      Seq(Row(1L, m)).asJava, sch)
    t.write(df(Map("a" -> "1", "b" -> "1")))
    t.write(df(Map("b" -> "2", "c" -> "2")))
    val got = t.read.head.getMap[String, String](1)
    assert(got == Map("a" -> "1", "b" -> "2", "c" -> "2"), got.toString)
    // a null map neither clears nor nulls the accumulated value
    t.write(spark.createDataFrame(Seq(Row(1L, null)).asJava, sch))
    val got2 = t.read.head.getMap[String, String](1)
    assert(got2 == Map("a" -> "1", "b" -> "2", "c" -> "2"), got2.toString)
  }

  test("descending DOUBLE sequence: NaN loses to every real number") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("s", DoubleType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "s",
        "sequence.field.sort-order" -> "descending"))
    def df(rows: (Long, String, Double)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, sch)
    t.write(df((1L, "real", 5.0)))
    // descending picks the SMALLEST sequence; NaN is the LARGEST
    // double, so it must lose — bare negation maps NaN to itself
    // (still the maximum) and would wrongly pick it
    t.write(df((1L, "nan", Double.NaN)))
    assert(t.read.head.getString(1) == "real")
    t.write(df((1L, "smaller", 1.0)))
    assert(t.read.head.getString(1) == "smaller")
  }

  test("aggregation engine retracts sum and count; others ignore retracts") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("total", LongType, nullable = true),
      StructField("n", LongType, nullable = true),
      StructField("last", StringType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "aggregation",
        "fields.total.aggregate-function" -> "sum",
        "fields.n.aggregate-function" -> "count",
        "fields.last.aggregate-function" -> "last_non_null_value"))
    def df(rows: (Long, java.lang.Long, java.lang.Long, String)*) =
      spark.createDataFrame(
        rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, sch)
    t.write(df((1L, 10L, 1L, "a")))
    t.write(df((1L, 5L, 1L, "b")))
    // retract the first contribution
    val retract = df((1L, 10L, 1L, "a"))
      .withColumn(graft.core.Meta.KindCol,
        lit(graft.core.Meta.KindDelete).cast("byte"))
    t.writeKinded(retract)
    val r = t.read.head
    assert(r.getLong(1) == 5L, "sum must subtract the retracted value")
    assert(r.getLong(2) == 1L, "count must decrement")
    assert(r.getString(3) == "b", "last_non_null ignores the retract row")
  }

  private val nestedType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("val", StringType, nullable = true))))

  test("nested_update: last row per nested key wins across commits") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("items", nestedType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "aggregation",
        "sequence.field" -> "seq",
        "fields.items.aggregate-function" -> "nested_update",
        "fields.items.nested-key" -> "id"))
    def df(seq: Long, items: Seq[(Long, String)]) = spark.createDataFrame(
      Seq(Row(1L, items.map(i => Row(i._1, i._2)), seq)).asJava, sch)
    t.write(df(1L, Seq((10L, "x"), (20L, "y"))))
    t.write(df(2L, Seq((10L, "x2"), (30L, "z"))))
    val items = t.read.head.getSeq[Row](1)
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(items == Seq((10L, "x2"), (20L, "y"), (30L, "z")))
  }

  test("nested_partial_update merges fields per nested key") {
    val nt = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("x", StringType, nullable = true),
      StructField("y", StringType, nullable = true))))
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("items", nt, nullable = true),
      StructField("seq", LongType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "aggregation",
        "sequence.field" -> "seq",
        "fields.items.aggregate-function" -> "nested_partial_update",
        "fields.items.nested-key" -> "id"))
    def df(seq: Long, items: Seq[(Long, String, String)]) = spark.createDataFrame(
      Seq(Row(1L, items.map(i => Row(i._1, i._2, i._3)), seq)).asJava, sch)
    t.write(df(1L, Seq((10L, "x1", null))))
    t.write(df(2L, Seq((10L, null, "y2"))))
    val items = t.read.head.getSeq[Row](1)
    assert(items.length == 1)
    assert(items.head.getString(1) == "x1" && items.head.getString(2) == "y2")
  }

  test("multi-column sequence.field compares lexicographically: (2,1) beats " +
    "(1,5), ties on the first field fall to the second, across merge, " +
    "point lookup and the upsert-key stale guard") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("s1", LongType, nullable = true),
      StructField("s2", LongType, nullable = true)))
    def df(rows: (Long, String, java.lang.Long, java.lang.Long)*) =
      spark.createDataFrame(
        rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, sch)
    // ---- PK merge: the reference compares the fields in order
    // (CoreOptions SEQUENCE_FIELD list + SequenceGenerator)
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "s1,s2", "bucket" -> "2"))
    t.write(df((1L, "old", 1L, 5L), (2L, "tie-lo", 7L, 1L)))
    t.write(df((1L, "new", 2L, 1L), (2L, "tie-hi", 7L, 2L)))
    val got = t.read.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "new", 2L -> "tie-hi"), s"got $got")
    // a LOWER first field loses even with a higher second field
    t.write(df((1L, "stale", 1L, 99L)))
    assert(t.read.filter(col("k") === 1L).head.getString(1) == "new")
    // point lookup agrees with the scan (shared preorder)
    val viaLookup = t.localLookup(Map("k" -> 1L)).head.getString(1)
    assert(viaLookup == "new", s"lookup said $viaLookup")
    // ---- upsert-key append table: stored (1,5) vs incoming (2,1)
    // must UPDATE (field 1 decides); a per-field AND would freeze it
    val wh = Files.createTempDirectory("graft-seq2-wh").toString
    graft.queries.withGraftExtensions(spark) { s3 =>
      s3.conf.set("spark.sql.catalog.seq2", "graft.sources.GraftCatalog")
      s3.conf.set("spark.sql.catalog.seq2.warehouse", wh)
      s3.sql("CREATE NAMESPACE IF NOT EXISTS seq2.db")
      s3.sql("""CREATE TABLE seq2.db.u (k BIGINT, v STRING, s1 BIGINT, s2 BIGINT)
               |TBLPROPERTIES ('upsert-key'='k', 'sequence.field'='s1,s2')""".stripMargin)
      s3.sql("INSERT INTO seq2.db.u VALUES (1, 'old', 1, 5)")
      s3.sql("INSERT INTO seq2.db.u VALUES (1, 'new', 2, 1)") // lexicographically newer
      assert(s3.sql("SELECT v FROM seq2.db.u WHERE k = 1").head.getString(0) == "new")
      s3.sql("INSERT INTO seq2.db.u VALUES (1, 'stale', 1, 99)") // lexicographically older
      assert(s3.sql("SELECT v FROM seq2.db.u WHERE k = 1").head.getString(0) == "new")
      // batch dedup also orders lexicographically: both versions in ONE
      // insert keep the (3,0) row over (2,9)
      s3.sql("INSERT INTO seq2.db.u VALUES (1, 'l29', 2, 9), (1, 'l30', 3, 0)")
      assert(s3.sql("SELECT v FROM seq2.db.u WHERE k = 1").head.getString(0) == "l30")
    }
  }

  test("multi-column sequence.field with sort-order=descending: the SMALLEST " +
    "lexicographic vector wins, scans and lookups agree") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("s1", LongType, nullable = true),
      StructField("s2", LongType, nullable = true)))
    def df(rows: (Long, String, java.lang.Long, java.lang.Long)*) =
      spark.createDataFrame(
        rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, sch)
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "s1,s2",
        "sequence.field.sort-order" -> "descending", "bucket" -> "2"))
    // (1,5) < (2,1) lexicographically -> the (1,5) row WINS descending;
    // a first-field tie falls to the second field, smaller wins
    t.write(df((1L, "big", 2L, 1L), (2L, "tie-hi", 7L, 9L)))
    t.write(df((1L, "small", 1L, 5L), (2L, "tie-lo", 7L, 2L)))
    val got = t.read.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "small", 2L -> "tie-lo"), s"got $got")
    // point lookup shares the inverted preorder
    assert(t.localLookup(Map("k" -> 1L)).map(_.getString(1)) == Seq("small"))
    assert(t.localLookup(Map("k" -> 2L)).map(_.getString(1)) == Seq("tie-lo"))
  }
}
