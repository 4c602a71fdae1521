package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Out-of-line BLOB storage (reference: paimon-api types/BlobType.java,
  * paimon-common data/Blob.java + BlobDescriptor — large payloads live
  * outside the columnar files, the table stores a descriptor).
  *
  * Columns listed in `blob.columns` keep their logical BinaryType, but
  * physically store a descriptor struct: payloads under
  * `blob.inline-threshold` (default 4 KiB) stay inline; larger ones are
  * written as content-addressed files `blob/<md5>.blob` during the
  * staging write job (executor-side, one pass) and the parquet column
  * holds only (file, length, hash).
  *
  * Why it matters at 100 TB: multi-MB media payloads inside parquet row
  * groups wreck page/rowgroup sizing, make column pruning useless for
  * metadata-only scans, and force compaction to rewrite payload bytes.
  * Out-of-line, the columnar files stay small, metadata queries never
  * touch payloads, and content addressing makes rewrites (compaction,
  * COW updates) reuse the same blob files instead of copying bytes —
  * writing the same payload twice is a no-op.
  */
object BlobStorage {

  val OptionColumns = "blob.columns"
  val OptionInlineThreshold = "blob.inline-threshold"
  val DefaultInlineThreshold = 4096

  val descriptorType: StructType = StructType(Seq(
    StructField("inline", BinaryType, nullable = true),
    StructField("file", StringType, nullable = true),
    StructField("length", LongType, nullable = true),
    StructField("hash", StringType, nullable = true)))

  def blobColumns(options: Map[String, String]): Seq[String] =
    options.get(OptionColumns)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  /** Replace each blob column's payload with its descriptor, writing
    * large payloads as content-addressed files. Runs INSIDE the staging
    * write job (the writer udf evaluates as rows stream to the writer,
    * and only on the CaseWhen branch for large payloads); a task retry
    * rewrites the same content to the same name, so replays are
    * idempotent. */
  def externalize(
      df: DataFrame, cols: Seq[String], blobDir: String, threshold: Int): DataFrame = {
    val writeBlob = udf((payload: Array[Byte]) => {
      val name = s"${md5Hex(payload)}.blob"
      val target = Paths.get(blobDir, name)
      if (!Files.exists(target)) {
        Files.createDirectories(target.getParent)
        val tmp = Paths.get(s"$blobDir/$name.tmp.${java.util.UUID.randomUUID()}")
        Files.write(tmp, payload)
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp): Unit } // concurrent writer won: same bytes
      }
      name
    })
    def desc(c: Column): Column = {
      // the udf returns "<md5hex>.blob" — deriving the hash field from
      // it digests each multi-MB payload ONCE, not twice (the dominant
      // CPU cost of externalizing large media batches)
      val written = writeBlob(c)
      when(c.isNull, lit(null).cast(descriptorType))
        .when(length(c) < threshold, struct(
          c.as("inline"),
          lit(null).cast(StringType).as("file"),
          length(c).cast("long").as("length"),
          md5(c).as("hash")))
        .otherwise(struct(
          lit(null).cast(BinaryType).as("inline"),
          written.as("file"),
          length(c).cast("long").as("length"),
          regexp_replace(written, "\\.blob$", "").as("hash")))
    }
    cols.filter(df.columns.contains)
      .foldLeft(df)((d, c) => d.withColumn(c, desc(col(c))))
  }

  /** Inverse of externalize: descriptor struct → original bytes. */
  def inflate(df: DataFrame, cols: Seq[String], blobDir: String): DataFrame = {
    val readBlob = udf((file: String) =>
      Files.readAllBytes(Paths.get(blobDir, file)))
    def payload(c: Column): Column =
      when(c.isNull, lit(null).cast(BinaryType))
        .when(c.getField("inline").isNotNull, c.getField("inline"))
        .otherwise(readBlob(c.getField("file")))
    cols.filter(df.columns.contains)
      .foldLeft(df)((d, c) => d.withColumn(c, payload(col(c))))
  }

  /** Physical file schema of a logical schema: blob columns store the
    * descriptor struct. */
  def physicalSchema(logical: StructType, cols: Seq[String]): StructType =
    StructType(logical.fields.map { f =>
      if (cols.contains(f.name)) f.copy(dataType = descriptorType)
      else f
    })
}
