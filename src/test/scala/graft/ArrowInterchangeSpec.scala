package graft

import graft.sources.ArrowInterchange
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Arrow interchange (reference: paimon-arrow ArrowFormatWriter /
  * ArrowBatchReader): distributed DataFrame ↔ Arrow-IPC-blob
  * conversion, value-exact across the covered type matrix. */
class ArrowInterchangeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sch = StructType(Seq(
    StructField("l", LongType, nullable = true),
    StructField("i", IntegerType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("f", FloatType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("bin", BinaryType, nullable = true),
    StructField("dt", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("dec", DecimalType(18, 4), nullable = true)))

  private def sampleRows: Seq[Row] = {
    val ts = java.sql.Timestamp.valueOf("2024-03-07 01:02:03.123456")
    Seq(
      Row(1L, 7, "hello", 1.5, 2.5f, true, Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-03-07"), ts,
        new java.math.BigDecimal("12345.6789")),
      Row(-2L, -8, "wörld ünïcode", -0.25, -1.0f, false, Array[Byte](),
        java.sql.Date.valueOf("1969-07-20"),
        java.sql.Timestamp.valueOf("1969-07-20 20:17:40.0"),
        new java.math.BigDecimal("-0.0001")),
      Row(null, null, null, null, null, null, null, null, null, null))
  }

  test("round-trip is value-exact across the type matrix, nulls included") {
    val df = spark.createDataFrame(sampleRows.asJava, sch).repartition(2)
    val blobs = ArrowInterchange.toIpcBatches(df, maxRowsPerBatch = 2)
    val back = ArrowInterchange.fromIpcBatches(spark, blobs, sch)
    def canon(r: Row): Seq[Any] = r.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    }
    val a = df.collect().map(canon).sortBy(_.toString()).toSeq
    val b = back.collect().map(canon).sortBy(_.toString()).toSeq
    assert(a == b, s"\n$a\nvs\n$b")
    // schema survives exactly (incl. decimal precision/scale, tz-ness)
    assert(back.schema == sch)
    assert(ArrowInterchange.fromArrowSchema(
      ArrowInterchange.toArrowSchema(sch)) == sch)
  }

  test("distributed conversion: one task per partition, batches capped") {
    val df = spark.range(0, 1000, 1, 4)
      .selectExpr("id AS l", "CAST(id AS INT) AS i", "CAST(id AS STRING) AS s",
        "CAST(id AS DOUBLE) AS d", "CAST(id AS FLOAT) AS f", "id % 2 = 0 AS b",
        "CAST(NULL AS BINARY) AS bin", "DATE'2024-01-01' AS dt",
        "TIMESTAMP'2024-01-01 00:00:00' AS ts",
        "CAST(id AS DECIMAL(18,4)) AS dec")
    val blobs = ArrowInterchange.toIpcBatches(df, maxRowsPerBatch = 100)
    // 4 partitions × 250 rows / 100-cap → 3 blobs each
    assert(blobs.count() == 12)
    val back = ArrowInterchange.fromIpcBatches(spark, blobs, df.schema)
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("l")).head.getLong(0)
      == (0L until 1000L).sum)
  }

  test("single merged IPC stream carries every batch") {
    val df = spark.createDataFrame(sampleRows.asJava, sch).repartition(3)
    val stream = ArrowInterchange.toIpcStream(df, maxRowsPerBatch = 1)
    // parse it back with plain Arrow (as an external consumer would)
    val allocator = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(stream), allocator)
    var rows = 0
    try {
      while (reader.loadNextBatch()) rows += reader.getVectorSchemaRoot.getRowCount
    } finally { reader.close(); allocator.close() }
    assert(rows == 3)
  }
}
