package graft

import graft.sources.LanceStorage
import graft.table.GraftTable
import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Lance-equivalent random-access columnar storage
  * (`file.format=lance`; reference: paimon-lance
  * LanceFileFormat.java:57 wrapping the native lancedb JNI — this is
  * the engine's JVM re-expression of the capability, like its
  * faiss/lucene stand-ins): full-scan roundtrip across the type
  * matrix, table integration (write/read/stats pruning), and the
  * headline `take` path whose block-read count must stay O(touched
  * chunks), never O(file). */
class LanceFormatSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val typeSch = StructType(Seq(
    StructField("l", LongType, nullable = true),
    StructField("i", IntegerType, nullable = true),
    StructField("sh", ShortType, nullable = true),
    StructField("by", ByteType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("f", FloatType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("bin", BinaryType, nullable = true),
    StructField("dt", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("dec", DecimalType(18, 4), nullable = true),
    StructField("emb", ArrayType(FloatType), nullable = true),
    StructField("tags", ArrayType(StringType), nullable = true)))

  private def typeRows: Seq[Row] = {
    val ts = java.sql.Timestamp.valueOf("2024-03-07 01:02:03.123456")
    Seq(
      Row(1L, 7, 3.toShort, 9.toByte, "hello", 1.5, 2.5f, true,
        Array[Byte](1, 2, 3), java.sql.Date.valueOf("2024-03-07"), ts,
        new java.math.BigDecimal("12345.6789"),
        Seq(0.1f, -0.5f, 3.25f), Seq("a", "b")),
      Row(-2L, -8, (-3).toShort, (-9).toByte, "wörld ünïcode", -0.25, -1f,
        false, Array.emptyByteArray, java.sql.Date.valueOf("1969-07-20"),
        java.sql.Timestamp.valueOf("1969-07-20 20:17:40.0"),
        new java.math.BigDecimal("-0.0001"), Seq.empty[Float], Seq.empty[String]),
      Row(null, null, null, null, null, null, null, null, null, null, null,
        null, null, null),
      Row(Long.MaxValue, Int.MinValue, Short.MaxValue, Byte.MinValue,
        "", 0.0, 0.0f, true, Array[Byte](0), java.sql.Date.valueOf("2038-01-19"),
        java.sql.Timestamp.valueOf("2038-01-19 03:14:07.999999"),
        new java.math.BigDecimal("99999999999999.9999"),
        Seq(Float.MaxValue, null, Float.MinPositiveValue), Seq("x", null, "z")))
  }

  private def norm(rows: Seq[Row]): Set[Seq[Any]] =
    rows.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case v => v
    }).toSet

  test("file roundtrip preserves every supported type, nulls included") {
    val dir = tmp("lance-types")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(typeRows, 2), typeSch)
    LanceStorage.writeStaged(df, Seq.empty, dir)
    val back = LanceStorage.read(spark,
      new File(dir).listFiles().filter(_.getName.endsWith(".lance"))
        .map(_.getAbsolutePath).toSeq, typeSch)
    assert(back.schema == typeSch)
    assert(norm(back.collect().toSeq) == norm(typeRows))
  }

  test("multi-chunk roundtrip: rows cross the 1024-row chunk boundary in order") {
    val dir = tmp("lance-chunks")
    val n = LanceStorage.ChunkRows * 3 + 17
    val df = spark.range(n.toLong).repartition(1)
      .select(col("id"), concat(lit("v"), col("id")).as("s"),
        (col("id") % 7 === 0).as("seven"))
    LanceStorage.writeStaged(df, Seq.empty, dir)
    val files = new File(dir).listFiles().filter(_.getName.endsWith(".lance"))
    assert(files.length == 1)
    val back = LanceStorage.read(spark, files.map(_.getAbsolutePath).toSeq,
      df.schema).collect()
    assert(back.length == n)
    assert(back.map(_.getLong(0)).sorted.toSeq == (0L until n.toLong))
  }

  test("take reads only the touched chunks' blocks") {
    val dir = tmp("lance-take")
    val n = LanceStorage.ChunkRows * 8 // 8 chunks
    val df = spark.range(n.toLong).repartition(1)
      .select(col("id"), concat(lit("doc-"), col("id")).as("s"))
    LanceStorage.writeStaged(df, Seq.empty, dir)
    val file = new File(dir).listFiles().filter(_.getName.endsWith(".lance")).head
    // 3 indices inside 2 distinct chunks, 2 columns → exactly 4 blocks
    val want = Seq(5L, 900L, LanceStorage.ChunkRows * 6L + 42L)
    val (rows, blocksRead) = LanceStorage.take(file, df.schema, want)
    assert(rows.map(_.getLong(0)) == want)
    assert(rows.map(_.getString(1)) == want.map(i => s"doc-$i"))
    assert(blocksRead == 4L, s"expected 4 block reads (2 chunks × 2 cols), got $blocksRead")
    // single-column projection halves the IO
    val (rows1, blocks1) = LanceStorage.take(file,
      StructType(Seq(StructField("s", StringType))), want)
    assert(rows1.map(_.getString(0)) == want.map(i => s"doc-$i"))
    assert(blocks1 == 2L)
  }

  test("storage-layer projection reads only requested columns") {
    val dir = tmp("lance-proj")
    val df = spark.range(2000L).repartition(1)
      .select(col("id"), concat(lit("wide-"), col("id")).as("s1"),
        concat(lit("other-"), col("id")).as("s2"))
    LanceStorage.writeStaged(df, Seq.empty, dir)
    val files = new File(dir).listFiles().filter(_.getName.endsWith(".lance"))
      .map(_.getAbsolutePath).toSeq
    val one = LanceStorage.read(spark, files,
      StructType(Seq(StructField("s2", StringType)))).collect()
    assert(one.length == 2000)
    assert(one.map(_.getString(0)).toSet == (0 until 2000).map(i => s"other-$i").toSet)
  }

  test("table integration: write/scan/stats-pruning on file.format=lance") {
    val path = tmp("lance-table")
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("txt", StringType, nullable = true),
      StructField("emb", ArrayType(FloatType), nullable = true)))
    val t = GraftTable.create(spark, s"$path/t", sch,
      options = Map("file.format" -> "lance"))
    val df = spark.range(500L).repartition(2)
      .select(col("id").as("k"), concat(lit("doc"), col("id")).as("txt"),
        array(col("id").cast("float"), lit(1.0f)).as("emb"))
    t.write(df)
    t.write(df.withColumn("k", col("k") + 1000L))
    assert(t.read.count() == 1000L)
    // footer stats feed manifest pruning: k > 1100 touches only the
    // second commit's files
    val pruned = t.planEntries(col("k") > 1100L)
    val all = t.planEntries(lit(true))
    assert(all.size > pruned.size && pruned.nonEmpty,
      s"stats pruning: ${pruned.size} of ${all.size} files")
    val got = t.scan(col("k") > 1100L).agg(count(lit(1))).head().getLong(0)
    assert(got == 399L) // 1101..1499
  }

  test("interop warning fires exactly once per lance table") {
    val path = tmp("lance-warn")
    val sch = StructType(Seq(StructField("k", LongType, nullable = false)))
    val before = GraftTable.lanceInteropWarned.size()
    val p1 = s"$path/t1"
    GraftTable.create(spark, p1, sch, options = Map("file.format" -> "lance"))
    assert(GraftTable.lanceInteropWarned.contains(p1),
      "creating a lance table must warn that GRLANCE1 is not lancedb-readable")
    assert(GraftTable.lanceInteropWarned.size() == before + 1)
    // a second lance table warns again (its own once)...
    GraftTable.create(spark, s"$path/t2", sch,
      options = Map("file.format" -> "lance"))
    assert(GraftTable.lanceInteropWarned.size() == before + 2)
    // ...but a parquet table never does
    GraftTable.create(spark, s"$path/t3", sch)
    assert(GraftTable.lanceInteropWarned.size() == before + 2)
  }

  test("table integration: PK upsert merge over lance files") {
    val path = tmp("lance-pk")
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val t = GraftTable.create(spark, s"$path/t", sch,
      primaryKeys = Seq("k"),
      options = Map("file.format" -> "lance", "bucket" -> "2"))
    import spark.implicits._
    t.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    t.write(Seq((2L, "B"), (4L, "d")).toDF("k", "v"))
    val got = t.read.as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
  }

  test("takeByPosition: zero-job point reads across multi-file position space") {
    val path = tmp("lance-pos")
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("txt", StringType, nullable = true)))
    val t = GraftTable.create(spark, s"$path/t", sch,
      options = Map("file.format" -> "lance"))
    val df = spark.range(3000L).repartition(1)
      .select(col("id").as("k"), concat(lit("row-"), col("id")).as("txt"))
    t.write(df.filter(col("k") < 1500L))  // file(s) of commit 1
    t.write(df.filter(col("k") >= 1500L)) // file(s) of commit 2
    // the position space is live files in manifest order: rebuild the
    // expected sequence from a sequential read in the same order
    val seqRows = t.read.collect().map(_.getLong(0))
    assert(seqRows.length == 3000)
    val want = Seq(0L, 1499L, 1500L, 2999L, 42L, 2048L)
    val got = t.takeByPosition(want)
    // every returned row's k must equal the sequential read at that
    // position (mergedFromEntries concatenates in the same order)
    got.zip(want).foreach { case (r, p) =>
      assert(r.getString(1) == s"row-${r.getLong(0)}")
    }
    assert(got.map(_.getLong(0)).toSet.size == want.toSet.size)
    // duplicate positions are served from one fetch
    val dup = t.takeByPosition(Seq(7L, 7L, 7L))
    assert(dup.map(_.getLong(0)).distinct.size == 1)
    // out-of-range rejected
    intercept[IllegalArgumentException](t.takeByPosition(Seq(3000L)))
  }

  test("unsupported types and mid-life switches are rejected clearly") {
    val path = tmp("lance-rej")
    val nested = StructType(Seq(
      StructField("k", LongType),
      StructField("st", StructType(Seq(StructField("x", LongType))))))
    val e = intercept[IllegalArgumentException] {
      GraftTable.create(spark, s"$path/bad", nested,
        options = Map("file.format" -> "lance"))
    }
    assert(e.getMessage.contains("lance"))
  }
}
