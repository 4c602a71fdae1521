package graft

import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** VARIANT and TIME(p) column support through the table layer
  * (reference: paimon-api types VariantType.java / TimeType.java;
  * paimon-common data/variant/). Spark 4 has native VariantType and
  * TimeType — the table layer must round-trip them through schema
  * persistence (DDL string), parquet storage, stats collection and the
  * merged read path.
  */
class TypeSupportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-type").toString + "/t"

  test("variant column round-trips through append table") {
    import spark.implicits._
    val src = Seq(
      (1L, """{"a": 1, "b": "x"}"""),
      (2L, """{"a": 2, "b": "y", "c": [1,2,3]}"""),
      (3L, """{"a": 3}""")).toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v"))
    assert(src.schema("v").dataType == VariantType)
    val t = GraftTable.create(spark, tmp(), src.schema)
    t.write(src)
    val back = t.read
    assert(back.schema("v").dataType == VariantType)
    val got = back
      .select(col("id"), variant_get(col("v"), "$.a", "bigint").as("a"),
        variant_get(col("v"), "$.b", "string").as("b"))
      .orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    assert(got(0).getString(2) == "x" && got(2).isNullAt(2))
  }

  test("variant column survives PK-table merge (latest wins)") {
    import spark.implicits._
    def batch(seq: Long, a: Long) =
      Seq((1L, seq, s"""{"a": $a}""")).toDF("k", "seq", "js")
        .select(col("k"), col("seq"), parse_json(col("js")).as("v"))
    val src = batch(1L, 10L)
    val t = GraftTable.create(spark, tmp(), src.schema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t.write(src)
    t.write(batch(2L, 20L))
    val got = t.read.select(variant_get(col("v"), "$.a", "bigint")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(20L))
  }

  test("time column round-trips through append table") {
    import spark.implicits._
    // TIME(p) is feature-flagged in Spark 4.1; runtime-settable
    spark.conf.set("spark.sql.timeType.enabled", "true")
    val src = Seq((1L, 10, 30, 0), (2L, 23, 59, 59), (3L, 0, 0, 1))
      .toDF("id", "h", "m", "s")
      .select(col("id"), make_time(col("h"), col("m"), col("s")).as("t"))
    assert(src.schema("t").dataType.isInstanceOf[TimeType])
    val tbl = GraftTable.create(spark, tmp(), src.schema)
    tbl.write(src)
    val back = tbl.read
    assert(back.schema("t").dataType.isInstanceOf[TimeType])
    val got = back.select(col("id"), col("t").cast(StringType))
      .orderBy("id").collect()
    assert(got.map(_.getString(1)).toSeq ==
      Seq("10:30:00", "23:59:59", "00:00:01"))
    // predicate on the time column still prunes/filters correctly
    assert(back.filter(col("t") > make_time(lit(12), lit(0), lit(0))).count() == 1)
  }

  test("TIME predicates prune files via normalized footer stats") {
    import spark.implicits._
    spark.conf.set("spark.sql.timeType.enabled", "true")
    // two files with disjoint time ranges: morning [08:00,09:00],
    // evening [18:00,19:00]
    def mk(h1: Int, h2: Int) =
      Seq((1L, h1), (2L, h2)).toDF("id", "h")
        .select(col("id"), make_time(col("h"), lit(0), lit(0)).as("t"))
        .coalesce(1)
    val tbl = GraftTable.create(spark, tmp(), mk(8, 9).schema)
    tbl.write(mk(8, 9))
    tbl.write(mk(18, 19))
    assert(tbl.read.inputFiles.length == 2)
    // strict inequality: before the Option[Int] fix an unknown-type
    // compare defaulted to 0 and pruned EVERY file here
    val evening = tbl.scan(col("t") > make_time(lit(12), lit(0), lit(0)))
    assert(evening.inputFiles.length == 1, "should prune the morning file")
    assert(evening.count() == 2)
    // range excludes everything → all files pruned
    assert(tbl.scan(col("t") > make_time(lit(22), lit(0), lit(0))).inputFiles.isEmpty)
    // range covers everything → nothing pruned
    val all = tbl.scan(col("t") >= make_time(lit(8), lit(0), lit(0)))
    assert(all.inputFiles.length == 2 && all.count() == 4)
  }

  test("CHAR/VARCHAR: declared lengths persist, CHAR pads, over-length rejects") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("code", CharType(4), nullable = true),
      StructField("name", VarcharType(6), nullable = true))))
    // the declared DDL survives the schema JSON round-trip
    val t2 = GraftTable.load(spark, t.path)
    assert(t2.schema.fields.filter(_.name != "id")
      .map(f => f.name -> f.dataType).toMap ==
      Map("code" -> "CHAR(4)", "name" -> "VARCHAR(6)"))
    // runtime struct is plain strings (Spark's own char/varchar model)
    assert(t2.schema.toStruct("code").dataType == StringType)
    t2.write(Seq((1L, "ab", "short"), (2L, null, null)).toDF("id", "code", "name"))
    val got = t2.read.orderBy("id").collect()
    assert(got(0).getString(1) == "ab  ", "CHAR(4) must right-pad")
    assert(got(0).getString(2) == "short", "VARCHAR stores as-is")
    assert(got(1).isNullAt(1) && got(1).isNullAt(2), "nulls pass through")
    // over-length values are rejected with a clear error, not truncated
    val e1 = intercept[Exception](
      t2.write(Seq((3L, "abcde", "ok")).toDF("id", "code", "name")))
    assert(e1.getMessage.contains("CHAR(4)") || Option(e1.getCause)
      .exists(_.getMessage.contains("CHAR(4)")), e1.getMessage)
    val e2 = intercept[Exception](
      t2.write(Seq((3L, "abcd", "waytoolong")).toDF("id", "code", "name")))
    assert(e2.getMessage.contains("VARCHAR(6)") || Option(e2.getCause)
      .exists(_.getMessage.contains("VARCHAR(6)")), e2.getMessage)
    assert(t2.read.count() == 2, "failed writes must not land")
  }

  test("MULTISET round-trips as MAP<T, INT> with bag semantics") {
    import spark.implicits._
    import graft.functions.TableFunctions._
    val msField = StructField("bag",
      MapType(StringType, IntegerType, valueContainsNull = false),
      nullable = true,
      new MetadataBuilder().putBoolean(graft.core.Meta.MultisetMeta, true).build())
    val t = GraftTable.create(spark, tmp(), StructType(Seq(
      StructField("id", LongType, nullable = false), msField)))
    // format-level type is MULTISET; runtime type is MAP<STRING, INT>
    assert(t.schema.fields.find(_.name == "bag").get.dataType == "MULTISET<STRING>")
    val t2 = GraftTable.load(spark, t.path)
    assert(t2.schema.toStruct("bag").dataType ==
      MapType(StringType, IntegerType, valueContainsNull = false))
    val src = Seq((1L, Seq("a", "b", "a", "a")), (2L, Seq.empty[String]))
      .toDF("id", "arr")
      .select(col("id"), multiset(col("arr")).as("bag"))
    t2.write(src)
    val got = t2.read.orderBy("id").collect()
    assert(got(0).getMap[String, Int](1).toMap == Map("a" -> 3, "b" -> 1))
    assert(got(0).getMap[String, Int](1).isInstanceOf[scala.collection.Map[_, _]])
    assert(got(1).getMap[String, Int](1).isEmpty)
    // bag helpers: cardinality counts multiplicity; union adds counts
    val card = t2.read.filter(col("id") === 1L)
      .select(multisetCardinality(col("bag"))).head.getInt(0)
    assert(card == 4)
    val u = spark.range(1).select(multisetUnion(
      multiset(array(lit("x"), lit("y"))),
      multiset(array(lit("y"), lit("y")))).as("u"))
      .head.getMap[String, Int](0).toMap
    assert(u == Map("x" -> 1, "y" -> 3))
  }

  test("CHAR pads consistently through CDC applyChanges and MERGE INTO") {
    import spark.implicits._
    // a CHAR primary key written via write() lands padded; the CDC and
    // MERGE paths must pad identically or the same logical key exists
    // twice (padded + unpadded) and never merges
    val t = GraftTable.create(spark, tmp(), StructType(Seq(
      StructField("code", CharType(4), nullable = false),
      StructField("v", LongType, nullable = true))),
      primaryKeys = Seq("code"))
    t.write(Seq(("ab", 1L)).toDF("code", "v"))
    t.applyChanges(Seq(("ab", 2L, "+U")).toDF("code", "v", "_row_kind"))
    val afterCdc = t.read.collect()
    assert(afterCdc.length == 1, s"CDC upsert must merge, got ${afterCdc.toSeq}")
    assert(afterCdc(0).getString(0) == "ab  " && afterCdc(0).getLong(1) == 2L)
    t.mergeInto(Seq(("ab", 3L)).toDF("code", "v"),
      whenMatchedUpdate = Some(Map("v" -> col("v"))))
    val afterMerge = t.read.collect()
    assert(afterMerge.length == 1 && afterMerge(0).getLong(1) == 3L,
      s"MERGE must hit the padded key, got ${afterMerge.toSeq}")
    // over-length values are rejected on the CDC path too
    val e = intercept[Exception](
      t.applyChanges(Seq(("abcde", 9L, "+I")).toDF("code", "v", "_row_kind")))
    assert(e.getMessage.contains("CHAR(4)") || Option(e.getCause)
      .exists(_.getMessage.contains("CHAR(4)")), e.getMessage)
  }

  test("patchColumn enforces CHAR padding and VARCHAR length like other commit paths") {
    import spark.implicits._
    // a data-evolution patch of a CHAR(n)/VARCHAR(n) column must store
    // the same padded/length-checked form as write()/CDC/MERGE —
    // otherwise the patched and stored variants of one logical value
    // compare unequal at read
    val t = GraftTable.create(spark, tmp(), StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("code", CharType(4), nullable = true),
      StructField("tag", VarcharType(3), nullable = true))),
      options = Map(GraftTable.RowTrackingEnabled -> "true"))
    t.write(Seq((1L, "ab", "x"), (2L, "cd", "y")).toDF("id", "code", "tag"))
    // patch id=1's CHAR column with an unpadded value: must land padded
    // (row ids are assignment-ordered, not id-ordered — look it up)
    val rid1 = t.readWithRowIds().filter(col("id") === 1L)
      .select(GraftTable.RowIdCol).head.getLong(0)
    t.patchColumn("code", Seq((rid1, "zz")).toDF(GraftTable.RowIdCol, "code"))
    val got = t.read.orderBy("id").collect()
    assert(got(0).getString(1) == "zz  ",
      s"patched CHAR must store padded, got '${got(0).getString(1)}'")
    assert(got(1).getString(1) == "cd  ")
    // comparisons between patched and written values behave uniformly
    assert(t.read.filter(col("code") === lit("zz  ")).count() == 1)
    // over-length patch values are rejected, CHAR and VARCHAR alike
    val e1 = intercept[Exception](
      t.patchColumn("code", Seq((1L, "abcde")).toDF(GraftTable.RowIdCol, "code")))
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).mkString)
      .contains("CHAR(4)"), e1.getMessage)
    val e2 = intercept[Exception](
      t.patchColumn("tag", Seq((1L, "wxyz")).toDF(GraftTable.RowIdCol, "tag")))
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).mkString)
      .contains("VARCHAR(3)"), e2.getMessage)
  }

  test("schema evolution reads old files with MULTISET and CHAR columns") {
    import spark.implicits._
    import graft.functions.TableFunctions._
    // old-schema files must resolve their stored DDLs through the
    // runtime mapping (Meta.sparkTypeOf): MULTISET<...> is not
    // DataType.fromDDL-parseable and CHAR(n) must resolve to STRING,
    // so a single addColumn used to break every read of prior files
    val t = GraftTable.create(spark, tmp(), StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("code", CharType(3), nullable = true),
      StructField("bag",
        MapType(StringType, IntegerType, valueContainsNull = false),
        nullable = true,
        new MetadataBuilder()
          .putBoolean(graft.core.Meta.MultisetMeta, true).build()))))
    t.write(Seq((1L, "a", Seq("x", "x", "y"))).toDF("id", "code", "arr")
      .select(col("id"), col("code"), multiset(col("arr")).as("bag")))
    t.addColumn("extra", StringType)
    t.write(Seq((2L, "b", Seq("z"), "e")).toDF("id", "code", "arr", "extra")
      .select(col("id"), col("code"), multiset(col("arr")).as("bag"), col("extra")))
    val got = t.read.orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).getString(1) == "a  " && got(0).isNullAt(3),
      "old-schema file reads through evolution with CHAR padding intact")
    assert(got(0).getMap[String, Int](2).toMap == Map("x" -> 2, "y" -> 1))
    assert(got(1).getString(3) == "e")
  }

  test("DECIMAL predicates prune files via scale-normalized footer stats") {
    import spark.implicits._
    def mk(lo: String, hi: String) =
      Seq((1L, BigDecimal(lo)), (2L, BigDecimal(hi))).toDF("id", "price")
        .select(col("id"), col("price").cast(DecimalType(10, 2)).as("price"))
        .coalesce(1)
    val tbl = GraftTable.create(spark, tmp(), mk("1.10", "2.20").schema)
    tbl.write(mk("1.10", "2.20"))
    tbl.write(mk("100.50", "200.75"))
    assert(tbl.read.inputFiles.length == 2)
    val big = tbl.scan(col("price") > BigDecimal("50.00"))
    assert(big.inputFiles.length == 1, "should prune the low-price file")
    assert(big.count() == 2)
    assert(tbl.scan(col("price") > BigDecimal("999.99")).inputFiles.isEmpty)
    val eq = tbl.scan(col("price") === BigDecimal("100.50"))
    assert(eq.inputFiles.length == 1 && eq.count() == 1)
  }
}
