package graft

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Out-of-line BLOB storage (reference: BlobType.java / Blob.java):
  * large binary payloads live as content-addressed files under blob/,
  * the columnar files hold descriptors, reads re-inflate
  * transparently. */
class BlobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-blob").toString + "/t"

  private val sch = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("tag", StringType, nullable = true)))

  private def payload(seed: Int, size: Int): Array[Byte] =
    Array.tabulate(size)(i => ((i * 31 + seed) % 251).toByte)

  private def df(rows: (Long, Array[Byte], String)*) =
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, sch).coalesce(1)

  test("large payloads go out-of-line, small stay inline; reads round-trip") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, sch, options = Map(
      "blob.columns" -> "media", "blob.inline-threshold" -> "100"))
    val big1 = payload(1, 5000)
    val big2 = payload(2, 8000)
    val small = payload(3, 10)
    t.write(df((1L, big1, "a"), (2L, big2, "b"), (3L, small, "c"), (4L, null, "d")))
    // out-of-line files exist only for the large payloads
    val blobFiles = Files.list(Paths.get(dir, "blob")).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(blobFiles.size == 2, s"expected 2 blob files, got $blobFiles")
    // full round-trip through the transparent read
    val got = t.read.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[Array[Byte]](1)))).toMap
    assert(got(1L).get.sameElements(big1))
    assert(got(2L).get.sameElements(big2))
    assert(got(3L).get.sameElements(small))
    assert(got(4L).isEmpty)
    // parquet data files stay small: payload bytes are not in-line
    val dataSizes = Files.walk(Paths.get(dir, "data")).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).map(Files.size(_)).toSeq
    assert(dataSizes.sum < 5000, s"payloads leaked into parquet: $dataSizes")
  }

  test("content addressing dedups identical payloads across rows and commits") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, sch, options = Map(
      "blob.columns" -> "media", "blob.inline-threshold" -> "100"))
    val big = payload(7, 4000)
    t.write(df((1L, big, "a"), (2L, big, "b")))
    t.write(df((3L, big, "c"))) // same content, later commit
    val blobFiles = Files.list(Paths.get(dir, "blob")).iterator().asScala.toSeq
    assert(blobFiles.size == 1, "identical payloads must share one blob file")
    assert(t.read.count() == 3)
  }

  test("descriptor-only read exposes metadata without payload bytes") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, sch, options = Map(
      "blob.columns" -> "media", "blob.inline-threshold" -> "100"))
    t.write(df((1L, payload(1, 3000), "a"), (2L, payload(2, 50), "b")))
    val d = t.readBlobDescriptors
      .select(col("id"), col("media.file"), col("media.length"))
      .orderBy("id").collect()
    assert(d(0).getString(1) != null && d(0).getLong(2) == 3000L)
    assert(d(1).getString(1) == null && d(1).getLong(2) == 50L) // inline
  }

  test("compaction and PK upserts reuse blob files; orphan GC keeps live blobs") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, sch, primaryKeys = Seq("id"),
      options = Map("blob.columns" -> "media",
        "blob.inline-threshold" -> "100", "bucket" -> "2"))
    val v1 = payload(1, 3000)
    val v2 = payload(2, 3500)
    t.write(df((1L, v1, "a"), (2L, v1, "b")))
    t.write(df((1L, v2, "a2"))) // upsert id=1 with new payload
    t.compact()
    val got = t.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(got(0)._2.sameElements(v2) && got(1)._2.sameElements(v1))
    // compaction re-externalized to the SAME content hashes: 2 files
    val blobs = Files.list(Paths.get(dir, "blob")).iterator().asScala.toSeq
    assert(blobs.size == 2)
    // orphan cleanup (no grace) must keep both still-referenced blobs
    t.expireSnapshots(retain = 1)
    val removed = t.removeOrphanFiles(graceMillis = -1000)
    val after = Files.list(Paths.get(dir, "blob")).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(after.size == 2, s"live blobs must survive GC, removed=$removed")
    assert(t.read.collect().map(_.getAs[Array[Byte]](1)).forall(_ != null))
  }
}
