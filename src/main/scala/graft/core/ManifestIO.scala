package graft.core

import graft.core.Meta.{ColStats, DataFileMeta, ManifestEntry}
import java.nio.ByteBuffer
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.{InputFile, OutputFile, PositionOutputStream, SeekableInputStream}
import org.apache.parquet.schema.{MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.stringType
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Binary (parquet) manifest codec.
  *
  * JSON manifests parse every entry on the driver on every planning
  * pass — at millions of files that parse time and driver memory are
  * the planning bottleneck. Parquet manifests are columnar, compressed
  * and cheap to decode, and the same bytes can be evaluated by a
  * distributed pruning job (reference: the Avro manifests of
  * paimon-core .../manifest/ManifestFile.java, scanned in parallel by
  * SnapshotReaderImpl.java:85).
  *
  * Encode/decode goes through in-memory byte arrays so manifests keep
  * flowing through the table's FileIO abstraction (atomic writes,
  * instrumentable IO) rather than raw Hadoop paths.
  */
object ManifestIO {

  private val SCHEMA: MessageType = Types.buildMessage()
    .required(BINARY).as(stringType()).named("kind")
    .repeatedGroup()
      .required(BINARY).as(stringType()).named("key")
      .required(BINARY).as(stringType()).named("value")
      .named("partition")
    .required(INT32).named("bucket")
    .required(BINARY).as(stringType()).named("fileName")
    .required(INT64).named("fileSize")
    .required(INT64).named("rowCount")
    .required(INT64).named("minSeq")
    .required(INT64).named("maxSeq")
    .required(INT32).named("level")
    .repeatedGroup()
      .required(BINARY).as(stringType()).named("col")
      .optional(BINARY).as(stringType()).named("min")
      .optional(BINARY).as(stringType()).named("max")
      .required(INT64).named("nullCount")
      .named("stats")
    .repeatedGroup()
      .required(BINARY).as(stringType()).named("col")
      .required(BINARY).as(stringType()).named("path")
      .named("indexFiles")
    .optional(BINARY).as(stringType()).named("dvFile")
    .optional(INT64).named("dvCardinality")
    .required(INT64).named("schemaId")
    .optional(BOOLEAN).named("secIndexed")
    .optional(INT64).named("firstRowId")
    .optional(INT64).named("creationTime")
    .named("manifest_entry")

  /** `manifest.compression` (reference: CoreOptions
    * MANIFEST_COMPRESSION) — codec for the parquet manifest bytes. */
  def codecOf(name: String): CompressionCodecName = name.toLowerCase match {
    case "snappy" => CompressionCodecName.SNAPPY
    case "zstd" => CompressionCodecName.ZSTD
    case "gzip" => CompressionCodecName.GZIP
    case "lz4" => CompressionCodecName.LZ4_RAW
    case "none" | "uncompressed" => CompressionCodecName.UNCOMPRESSED
    case other => throw new IllegalArgumentException(
      s"unsupported manifest.compression '$other' " +
        "(snappy|zstd|gzip|lz4|none)")
  }

  def encode(entries: Seq[ManifestEntry],
      compression: String = "snappy"): Array[Byte] = {
    val out = new BytesOutputFile
    val writer = ExampleParquetWriter.builder(out)
      .withType(SCHEMA)
      .withCompressionCodec(codecOf(compression))
      .build()
    val factory = new SimpleGroupFactory(SCHEMA)
    try entries.foreach { e =>
      val g = factory.newGroup()
      g.append("kind", e.kind)
      e.partition.foreach { case (k, v) =>
        val pg = g.addGroup("partition"); pg.append("key", k); pg.append("value", v)
      }
      g.append("bucket", e.bucket)
      g.append("fileName", e.file.fileName)
      g.append("fileSize", e.file.fileSize)
      g.append("rowCount", e.file.rowCount)
      g.append("minSeq", e.file.minSeq)
      g.append("maxSeq", e.file.maxSeq)
      g.append("level", e.file.level)
      e.file.stats.foreach { case (c, st) =>
        val sg = g.addGroup("stats")
        sg.append("col", c)
        st.min.foreach(sg.append("min", _))
        st.max.foreach(sg.append("max", _))
        sg.append("nullCount", st.nullCount)
      }
      e.file.indexFiles.getOrElse(Map.empty).foreach { case (c, p) =>
        val ig = g.addGroup("indexFiles"); ig.append("col", c); ig.append("path", p)
      }
      e.file.dvFile.foreach(g.append("dvFile", _))
      e.file.dvCardinality.foreach(g.append("dvCardinality", _))
      g.append("schemaId", e.file.schemaId)
      if (e.file.secIndexed) g.append("secIndexed", true)
      e.file.firstRowId.foreach(g.append("firstRowId", _))
      e.file.creationTime.foreach(g.append("creationTime", _))
      writer.write(g)
    } finally writer.close()
    out.toBytes
  }

  def decode(bytes: Array[Byte]): Seq[ManifestEntry] = {
    val reader = new GroupReaderBuilder(new BytesInputFile(bytes)).build()
    val buf = Seq.newBuilder[ManifestEntry]
    try {
      var g = reader.read()
      while (g != null) { buf += toEntry(g); g = reader.read() }
    } finally reader.close()
    buf.result()
  }

  private def toEntry(g: Group): ManifestEntry = {
    def optStr(field: String): Option[String] =
      if (g.getFieldRepetitionCount(field) > 0) Some(g.getString(field, 0)) else None
    val partition = (0 until g.getFieldRepetitionCount("partition")).map { i =>
      val pg = g.getGroup("partition", i)
      pg.getString("key", 0) -> pg.getString("value", 0)
    }.toMap
    val stats = (0 until g.getFieldRepetitionCount("stats")).map { i =>
      val sg = g.getGroup("stats", i)
      def opt(f: String): Option[String] =
        if (sg.getFieldRepetitionCount(f) > 0) Some(sg.getString(f, 0)) else None
      sg.getString("col", 0) -> ColStats(opt("min"), opt("max"), sg.getLong("nullCount", 0))
    }.toMap
    val idx = (0 until g.getFieldRepetitionCount("indexFiles")).map { i =>
      val ig = g.getGroup("indexFiles", i)
      ig.getString("col", 0) -> ig.getString("path", 0)
    }.toMap
    ManifestEntry(
      kind = g.getString("kind", 0),
      partition = partition,
      bucket = g.getInteger("bucket", 0),
      file = DataFileMeta(
        fileName = g.getString("fileName", 0),
        fileSize = g.getLong("fileSize", 0),
        rowCount = g.getLong("rowCount", 0),
        minSeq = g.getLong("minSeq", 0),
        maxSeq = g.getLong("maxSeq", 0),
        level = g.getInteger("level", 0),
        stats = stats,
        indexFiles = if (idx.isEmpty) None else Some(idx),
        dvFile = optStr("dvFile"),
        dvCardinality =
          if (g.getFieldRepetitionCount("dvCardinality") > 0)
            Some(g.getLong("dvCardinality", 0)) else None,
        schemaId = g.getLong("schemaId", 0),
        secIndexed = g.getFieldRepetitionCount("secIndexed") > 0 &&
          g.getBoolean("secIndexed", 0),
        // guarded by containsField: manifests written before this
        // column existed decode with their own (older) file schema
        firstRowId =
          if (g.getType.containsField("firstRowId") &&
            g.getFieldRepetitionCount("firstRowId") > 0)
            Some(g.getLong("firstRowId", 0)) else None,
        creationTime =
          if (g.getType.containsField("creationTime") &&
            g.getFieldRepetitionCount("creationTime") > 0)
            Some(g.getLong("creationTime", 0)) else None))
  }

  private final class GroupReaderBuilder(file: InputFile)
      extends ParquetReader.Builder[Group](file) {
    override def getReadSupport: ReadSupport[Group] = new GroupReadSupport()
  }

  /** In-memory parquet OutputFile (manifests are small; staging them in
    * memory keeps the atomic FileIO write path). */
  private final class BytesOutputFile extends OutputFile {
    private val out = new java.io.ByteArrayOutputStream()
    private val stream: PositionOutputStream = new PositionOutputStream {
      private var pos = 0L
      override def getPos: Long = pos
      override def write(b: Int): Unit = { out.write(b); pos += 1 }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        out.write(b, off, len); pos += len
      }
    }
    override def create(blockSizeHint: Long): PositionOutputStream = stream
    override def createOrOverwrite(blockSizeHint: Long): PositionOutputStream = stream
    override def supportsBlockSize(): Boolean = false
    override def defaultBlockSize(): Long = 0L
    def toBytes: Array[Byte] = out.toByteArray
  }

  private final class BytesInputFile(bytes: Array[Byte]) extends InputFile {
    override def getLength: Long = bytes.length.toLong
    override def newStream(): SeekableInputStream = new SeekableInputStream {
      private var pos = 0
      override def getPos: Long = pos.toLong
      override def seek(newPos: Long): Unit = pos = newPos.toInt
      override def read(): Int =
        if (pos >= bytes.length) -1 else { val b = bytes(pos) & 0xff; pos += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (pos >= bytes.length) return -1
        val n = math.min(len, bytes.length - pos)
        System.arraycopy(bytes, pos, b, off, n); pos += n; n
      }
      override def read(buf: ByteBuffer): Int = {
        if (pos >= bytes.length) return -1
        val n = math.min(buf.remaining(), bytes.length - pos)
        buf.put(bytes, pos, n); pos += n; n
      }
      override def readFully(b: Array[Byte]): Unit = readFully(b, 0, b.length)
      override def readFully(b: Array[Byte], off: Int, len: Int): Unit = {
        require(pos + len <= bytes.length, "EOF")
        System.arraycopy(bytes, pos, b, off, len); pos += len
      }
      override def readFully(buf: ByteBuffer): Unit = {
        val n = buf.remaining()
        require(pos + n <= bytes.length, "EOF")
        buf.put(bytes, pos, n); pos += n
      }
    }
  }
}
