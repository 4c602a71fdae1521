package graft.sources

import graft.core.Meta.{ColStats, DataFileMeta}
import java.io.File
import java.nio.ByteBuffer
import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Row-oriented Avro data files (`file.format=avro`) — the
  * write-optimized level-0 format: appending a row costs one datum
  * encode, no columnar buffering/dictionary/page machinery, which is
  * why the reference defaults its LSM level-0 to Avro
  * (paimon-format .../avro/AvroFileFormat.java:52 and
  * CoreOptions FILE_FORMAT; BASELINE.md lists Avro as its fastest LSM
  * write format).
  *
  * Spark's avro DataSource module is not on the classpath, so this
  * codes directly against avro-core (bundled with Spark): a
  * distributed write job appends GenericRecords per (partition,
  * bucket) directory in the same hive-style layout the parquet writer
  * produces, and the reader re-inflates records into Rows. Avro files
  * carry no footer statistics — the stats pass streams each file once
  * at commit time (executor-side for large commits, same as
  * parquet/ORC footer reads).
  *
  * Unlike the columnar writers, partition/bucket columns stay IN the
  * records (the reader then never needs directory-derived columns).
  */
object AvroStorage {

  // ---- schema mapping -------------------------------------------------

  /** Spark → Avro field schema. Scalar types only: table creation
    * rejects nested types for avro storage. */
  private def avroFieldType(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType | TimestampNTZType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType => // plain string: lossless, stats-comparable
      val s = Schema.create(Schema.Type.STRING)
      s.addProp("graftLogical", "decimal") // stats compare numerically
      s
    case other =>
      throw new IllegalArgumentException(
        s"file.format=avro supports scalar columns only, got $other")
  }

  def supports(struct: StructType): Boolean =
    // the FULL schema build, not just the type mapping: Avro rejects
    // field names Spark allows (spaces, dashes, dots, leading digits),
    // and a type-only check would let creation succeed and the first
    // write crash with SchemaParseException
    scala.util.Try(avroSchema(struct)).isSuccess

  def avroSchema(struct: StructType): Schema = {
    val fields = struct.fields.map { f =>
      val base = avroFieldType(f.dataType)
      val sch =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(clean(f.name), sch, null, null)
    }
    Schema.createRecord("graft_row", null, "graft", false, fields.toList.asJava)
  }

  /** Avro names forbid characters Spark allows (spaces, dashes, dots,
    * leading digits); [[supports]] runs the FULL schema build so such
    * columns are rejected at table creation, never at first write.
    * Spark hidden columns start with '_', which avro accepts. */
  private def clean(name: String): String = name

  // ---- write ----------------------------------------------------------

  /** Distributed staged write in hive-style partition-directory layout
    * (same shape `df.write.partitionBy(...)` produces, so the commit
    * adoption path is shared). Local-filesystem staging, matching the
    * table's LocalFileIO. */
  def writeStaged(out: DataFrame, partitionBy: Seq[String], staging: String): Unit = {
    val struct = out.schema
    val avroJson = avroSchema(struct).toString
    val fieldTypes = struct.fields.map(_.dataType)
    val fieldNames = struct.fields.map(_.name)
    val partIdx = partitionBy.map(struct.fieldIndex)
    out.rdd.foreachPartition { rows =>
      val sch = new Schema.Parser().parse(avroJson)
      val task = TaskContext.getPartitionId()
      // attempt-suffixed tmp name, renamed to final only on success:
      // a speculative/retried attempt never interleaves bytes with the
      // original, a failed attempt's partial file never matches the
      // adoption extension filter, and of two completed attempts the
      // adoption picks exactly one per partition id
      val attempt = TaskContext.get().taskAttemptId()
      val writers = mutable.Map.empty[String, (File, File, DataFileWriter[GenericRecord])]
      try {
        rows.foreach { row =>
          // Hive-escaped values + the null sentinel, exactly like
          // Spark's partitionBy on the parquet path: a raw rendering
          // would write "col=null" for nulls (decoded as the STRING
          // "null" by pruning), and a value containing '/' or '%'
          // would corrupt the directory structure / unescape wrongly
          val dir = partIdx.map { i =>
            val raw = row.get(i)
            val v =
              if (raw == null) org.apache.spark.sql.catalyst.catalog
                .ExternalCatalogUtils.DEFAULT_PARTITION_NAME
              else org.apache.spark.sql.catalyst.catalog
                .ExternalCatalogUtils.escapePathName(raw.toString)
            s"${fieldNames(i)}=$v"
          }.mkString("/")
          val (_, _, w) = writers.getOrElseUpdate(dir, {
            val d = if (dir.isEmpty) new File(staging) else new File(staging, dir)
            d.mkdirs()
            val fw = new DataFileWriter[GenericRecord](
              new GenericDatumWriter[GenericRecord](sch))
            fw.setCodec(CodecFactory.snappyCodec())
            val tmp = new File(d, s".part-$task-$attempt.avro.tmp")
            val fin = new File(d, s"part-$task-$attempt.avro")
            (tmp, fin, fw.create(sch, tmp))
          })
          val rec = new GenericData.Record(sch)
          var i = 0
          while (i < fieldTypes.length) {
            rec.put(i, toAvro(row.get(i), fieldTypes(i)))
            i += 1
          }
          w.append(rec)
        }
        writers.values.foreach { case (tmp, fin, w) =>
          w.close()
          java.nio.file.Files.move(tmp.toPath, fin.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      } finally writers.values.foreach { case (_, _, w) =>
        try w.close() catch { case _: Exception => () }
      }
    }
  }

  private def toAvro(v: Any, dt: DataType): Any = v match {
    case null => null
    case b: java.lang.Byte => b.intValue()
    case s: java.lang.Short => s.intValue()
    case ts: java.sql.Timestamp =>
      ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
    case ldt: java.time.LocalDateTime =>
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    case ins: java.time.Instant => // java8API sessions carry Instant
      ins.getEpochSecond * 1000000L + ins.getNano / 1000L
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case ld: java.time.LocalDate => ld.toEpochDay.toInt
    case dec: java.math.BigDecimal => dec.toPlainString
    case dec: scala.math.BigDecimal => dec.underlying().toPlainString
    case bytes: Array[Byte] => ByteBuffer.wrap(bytes)
    case other => other
  }

  // ---- read -----------------------------------------------------------

  /** Read avro files as a DataFrame with exactly `struct`'s fields
    * (matched by name; missing fields read as null). */
  def read(spark: SparkSession, paths: Seq[String], struct: StructType): DataFrame = {
    val fieldNames = struct.fields.map(_.name)
    val fieldTypes = struct.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(paths, math.min(math.max(paths.size, 1), 64))
      .flatMap { p =>
        // record-streaming: one datum resident at a time (never the
        // whole file); closes on exhaustion and on task completion so
        // an abandoning limit() cannot leak the handle
        val reader = DataFileReader.openReader(
          new File(p), new GenericDatumReader[GenericRecord]())
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; reader.close() }
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) closeOnce()
            h
          }
          override def next(): Row = {
            val rec = reader.next()
            val values = new Array[Any](fieldNames.length)
            var i = 0
            while (i < fieldNames.length) {
              val f = rec.getSchema.getField(fieldNames(i))
              values(i) =
                if (f == null) null
                else fromAvro(rec.get(f.pos()), fieldTypes(i))
              i += 1
            }
            Row.fromSeq(values.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rdd, struct)
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (i: java.lang.Integer, ByteType) => i.byteValue()
    case (i: java.lang.Integer, ShortType) => i.shortValue()
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(l, 1000L))
      ts.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt)
      ts
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l, 1000000L),
        (Math.floorMod(l, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (s, d: DecimalType) =>
      new java.math.BigDecimal(s.toString)
    case (b: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (other, _) => other
  }

  // ---- stats ----------------------------------------------------------

  /** Single streaming pass computing the same stringified min/max/null
    * stats the parquet footer reader produces — the "post-write stats
    * pass" avro needs because its files carry no footer statistics. */
  def stats(
      absolutePath: String,
      relativeName: String,
      level: Int,
      minSeq: Long,
      maxSeq: Long): DataFileMeta = {
    val file = new File(absolutePath)
    val reader = DataFileReader.openReader(
      file, new GenericDatumReader[GenericRecord]())
    try {
      val sch = reader.getSchema
      val fields = sch.getFields.asScala.toSeq
      val comparators: Array[(Any, Any) => Int] = fields.map { f =>
        val u = unwrap(f.schema())
        if (u.getType == Schema.Type.STRING &&
            u.getProp("graftLogical") == "decimal")
          (a: Any, b: Any) => new java.math.BigDecimal(a.toString)
            .compareTo(new java.math.BigDecimal(b.toString))
        else cmp _
      }.toArray
      val mins = new Array[Any](fields.size)
      val maxs = new Array[Any](fields.size)
      val nulls = new Array[Long](fields.size)
      var rowCount = 0L
      while (reader.hasNext) {
        val rec = reader.next()
        var i = 0
        while (i < fields.size) {
          val v = rec.get(i)
          if (v == null) nulls(i) += 1
          else {
            if (mins(i) == null || comparators(i)(v, mins(i)) < 0) mins(i) = v
            if (maxs(i) == null || comparators(i)(v, maxs(i)) > 0) maxs(i) = v
          }
          i += 1
        }
        rowCount += 1
      }
      val stats = fields.zipWithIndex.map { case (f, i) =>
        unwrap(f.schema()).getType match {
          // binary columns carry no min/max but KEEP the null count:
          // an all-null binary column still IS NULL / IS NOT NULL
          // prunes (OrcStats does the same)
          case Schema.Type.BYTES => f.name() -> ColStats(None, None, nulls(i))
          case _ => f.name() -> ColStats(
            Option(mins(i)).map(render),
            Option(maxs(i)).map(render),
            nulls(i))
        }
      }.toMap
      DataFileMeta(relativeName, file.length(), rowCount, minSeq, maxSeq,
        level, stats, creationTime = Some(System.currentTimeMillis()))
    } finally reader.close()
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
    case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
    case (x: java.lang.Float, y: java.lang.Float) => x.compareTo(y)
    case (x: java.lang.Double, y: java.lang.Double) => x.compareTo(y)
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
    // STRING stats must sort in UTF-8 BYTE order — the order
    // StatsFilter compares in (UTF-16 compareTo disagrees on
    // supplementary characters and wrong-prunes); Avro's Utf8
    // compareTo IS byte order
    case (x: org.apache.avro.util.Utf8, y: org.apache.avro.util.Utf8) =>
      x.compareTo(y)
    case (x, y) => java.util.Arrays.compareUnsigned(
      x.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def render(v: Any): String = v.toString
}
