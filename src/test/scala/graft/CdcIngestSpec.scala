package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** CDC ingestion: rowkind-labelled change batches applied to a PK
  * table with batch-driven schema evolution (reference:
  * paimon-flink-cdc RichCdcRecord + schema-evolving CDC sinks). */
class CdcIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-cdc").toString + "/t"

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def changes(rows: Seq[(Long, String, String)], extra: StructField*): DataFrame = {
    val s = StructType(sch.fields.toSeq ++ extra :+
      StructField("_row_kind", StringType, nullable = false))
    spark.createDataFrame(
      rows.map(r => Row.fromSeq(Seq(r._1, r._2) ++
        Seq.fill(extra.length)(null) :+ r._3)).asJava, s)
  }

  private def pkTable(): GraftTable =
    GraftTable.create(spark, tmp(), sch, primaryKeys = Seq("k"))

  test("kinds: +I/+U upsert, -D retracts, -U before-images are dropped") {
    val t = pkTable()
    t.applyChanges(changes(Seq((1L, "a", "+I"), (2L, "b", "+I"), (3L, "c", "+I"))))
    t.applyChanges(changes(Seq(
      (1L, "a-old", "-U"), (1L, "a2", "+U"), // update pair
      (2L, "zzz", "-D"), // delete
      (4L, "d", "I")))) // lenient insert label
    val got = t.read.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq(1L -> "a2", 3L -> "c", 4L -> "d"))
  }

  test("batch with a new column evolves the schema; old rows read NULL") {
    val t = pkTable()
    t.applyChanges(changes(Seq((1L, "a", "+I"))))
    val withCol = changes(Seq((2L, "b", "+I")),
      StructField("src", StringType, nullable = true))
      .withColumn("src", when(col("k") === 2L, lit("cdc")))
    t.applyChanges(withCol)
    assert(t.schema.fields.map(_.name).contains("src"))
    val got = t.read.select("k", "src").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    assert(got.toSeq == Seq(1L -> None, 2L -> Some("cdc")))
  }

  test("wider incoming type widens the table column") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n", IntegerType, nullable = true))), primaryKeys = Seq("k"))
    t.write(spark.createDataFrame(Seq(Row(1L, 7)).asJava, t.schema.toStruct))
    val wide = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n", LongType, nullable = true),
      StructField("_row_kind", StringType, nullable = false)))
    t.applyChanges(spark.createDataFrame(
      Seq(Row(2L, 5000000000L, "+I")).asJava, wide))
    assert(t.schema.fields.find(_.name == "n").get.dataType == "BIGINT")
    val got = t.read.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq(1L -> 7L, 2L -> 5000000000L))
  }

  test("epoch replay with the same commitIdentifier is a no-op") {
    val t = pkTable()
    t.applyChanges(changes(Seq((1L, "a", "+I"))), commitIdentifier = 7L)
    t.applyChanges(changes(Seq((1L, "DUP", "+I"))), commitIdentifier = 7L)
    assert(t.read.collect().map(_.getString(1)).toSeq == Seq("a"))
  }

  test("guards: append tables and batches without kinds or keys are refused") {
    val a = GraftTable.create(spark, tmp(), sch)
    intercept[IllegalArgumentException](
      a.applyChanges(changes(Seq((1L, "a", "+I")))))
    val t = pkTable()
    intercept[IllegalArgumentException](
      t.applyChanges(spark.createDataFrame(Seq(Row(1L, "a")).asJava, sch)))
    val noKey = StructType(Seq(
      StructField("v", StringType, nullable = true),
      StructField("_row_kind", StringType, nullable = false)))
    intercept[IllegalArgumentException](
      t.applyChanges(spark.createDataFrame(Seq(Row("a", "+I")).asJava, noKey)))
  }

  private def jsonDf(lines: String*): DataFrame = {
    import spark.implicits._
    lines.toSeq.toDF("value")
  }

  test("Debezium JSON: envelopes (payload-wrapped too) → kinds → applied state") {
    import graft.streaming.CdcFormats
    val t = pkTable()
    t.applyChanges(CdcFormats.debeziumJson(jsonDf(
      """{"after":{"k":1,"v":"a"},"op":"c"}""",
      """{"after":{"k":2,"v":"b"},"op":"r"}""")))
    // payload wrapper, update pair, before-only delete — one batch
    t.applyChanges(CdcFormats.debeziumJson(jsonDf(
      """{"payload":{"before":{"k":1,"v":"a"},"after":{"k":1,"v":"a2"},"op":"u"}}""",
      """{"payload":{"before":{"k":2,"v":"b"},"op":"d"}}""")))
    val got = t.read.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq(1L -> "a2"))
    // the parsed batch itself carries the full changelog incl. -U
    val kinds = CdcFormats.debeziumJson(jsonDf(
      """{"before":{"k":9,"v":"x"},"after":{"k":9,"v":"y"},"op":"u"}"""))
      .select("_row_kind").collect().map(_.getString(0)).sorted
    assert(kinds.toSeq == Seq("+U", "-U"))
  }

  test("Canal and Maxwell JSON map types to kinds") {
    import graft.streaming.CdcFormats
    val canal = CdcFormats.canalJson(jsonDf(
      """{"data":[{"k":1,"v":"a"},{"k":2,"v":"b"}],"type":"INSERT"}""",
      """{"data":[{"k":1,"v":"a2"}],"type":"UPDATE"}""",
      """{"data":[{"k":2,"v":"b"}],"type":"DELETE"}"""))
    val t = pkTable()
    t.applyChanges(canal)
    assert(t.read.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      .toSeq == Seq(1L -> "a2"))
    val t2 = pkTable()
    t2.applyChanges(CdcFormats.maxwellJson(jsonDf(
      """{"data":{"k":5,"v":"m"},"type":"insert"}""",
      """{"data":{"k":6,"v":"n"},"type":"insert"}""",
      """{"data":{"k":6,"v":"n"},"type":"delete"}""")))
    assert(t2.read.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L))
  }

  test("CDC edges: null before, reconstructed Canal/Maxwell -U, empty batches no-op") {
    import graft.streaming.CdcFormats
    // Debezium update with before=null (default REPLICA IDENTITY):
    // only +U — fabricating a -U would retract on a NULL key
    val mixed = CdcFormats.debeziumJson(jsonDf(
      """{"before":{"k":1,"v":"x"},"after":{"k":1,"v":"x2"},"op":"u"}""",
      """{"before":null,"after":{"k":2,"v":"y2"},"op":"u"}"""))
    val k1 = mixed.filter(col("k") === 1L)
      .select("_row_kind").collect().map(_.getString(0)).sorted
    val k2 = mixed.filter(col("k") === 2L)
      .select("_row_kind").collect().map(_.getString(0)).sorted
    assert(k1.toSeq == Seq("+U", "-U"), k1.toSeq.toString)
    assert(k2.toSeq == Seq("+U"), s"null-before update must emit only +U: ${k2.toSeq}")
    assert(!mixed.filter(col("_row_kind") === "-U" && col("k").isNull)
      .collect().exists(_ => true), "no all-null -U rows")

    // Canal UPDATE with `old`: the -U before-image is data overlaid
    // with old (changed columns only) — the reference parses
    // UPDATE_BEFORE the same way
    val canalU = CdcFormats.canalJson(jsonDf(
      """{"data":[{"k":1,"v":"new"}],"old":[{"v":"prev"}],"type":"UPDATE"}"""))
    val rowsC = canalU.select("k", "v", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._3)
    assert(rowsC.toSeq == Seq((1L, "new", "+U"), (1L, "prev", "-U")),
      rowsC.toSeq.toString)
    // Maxwell likewise
    val maxU = CdcFormats.maxwellJson(jsonDf(
      """{"data":{"k":7,"v":"after"},"old":{"v":"before"},"type":"update"}"""))
    val rowsM = maxU.select("k", "v", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._3)
    assert(rowsM.toSeq == Seq((7L, "after", "+U"), (7L, "before", "-U")),
      rowsM.toSeq.toString)
    // update WITHOUT old still emits the bare +U
    val bare = CdcFormats.canalJson(jsonDf(
      """{"data":[{"k":3,"v":"b2"}],"type":"UPDATE"}"""))
      .select("_row_kind").collect().map(_.getString(0))
    assert(bare.toSeq == Seq("+U"))

    // empty / all-tombstone batches: parsers and the sink no-op
    // instead of the streaming query dying on an envelope require
    val t = pkTable()
    t.applyChanges(changes(Seq((1L, "a", "+I"))))
    val before = t.read.count()
    Seq[DataFrame => DataFrame](
      CdcFormats.debeziumJson(_), CdcFormats.canalJson(_),
      CdcFormats.maxwellJson(_)).foreach { parse =>
      t.applyChanges(parse(jsonDf().limit(0)))
    }
    assert(t.read.count() == before)
  }

  test("Debezium parse is single-pass: one leaf scan regardless of op mix") {
    import graft.streaming.CdcFormats
    val parsed = CdcFormats.debeziumJson(jsonDf(
      """{"after":{"k":1,"v":"a"},"op":"c"}""",
      """{"before":{"k":1,"v":"a"},"after":{"k":1,"v":"a2"},"op":"u"}""",
      """{"before":{"k":2,"v":"b"},"op":"d"}"""))
    // the old shape unioned four per-kind filters of the batch (four
    // leaves); the single-pass shape explodes kinds in one projection
    assert(parsed.queryExecution.analyzed.collectLeaves().size == 1)
    val kinds = parsed.select("_row_kind").collect().map(_.getString(0)).sorted
    assert(kinds.toSeq == Seq("+I", "+U", "-D", "-U"))
    // image routing: +I/+U read after, -U/-D read before
    val rows = parsed.select("k", "v", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((1L, "a", "+I"), (1L, "a2", "+U"),
      (1L, "a", "-U"), (2L, "b", "-D")))
  }

  test("CDC format batch introducing a new column evolves the schema") {
    import graft.streaming.CdcFormats
    val t = pkTable()
    t.applyChanges(CdcFormats.debeziumJson(jsonDf(
      """{"after":{"k":1,"v":"a"},"op":"c"}""")))
    t.applyChanges(CdcFormats.debeziumJson(jsonDf(
      """{"after":{"k":2,"v":"b","src":"mysql"},"op":"c"}""")))
    val got = t.read.orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)).orNull))
    assert(got.toSeq == Seq((1L, null), (2L, "mysql")))
  }
}
