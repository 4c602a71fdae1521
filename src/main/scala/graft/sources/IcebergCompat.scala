package graft.sources

import graft.core.Meta.{ManifestEntry, TableSchema}
import graft.table.GraftTable
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types._
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Iceberg-compatible metadata export: after [[sync]], the table can be
  * read by any engine that understands the Apache Iceberg table format
  * (format-version 2) pointed at `<table>/metadata/` — without that
  * engine knowing anything about graft's own snapshot/manifest layout.
  *
  * What gets exposed (mirrors the reference's contract —
  * paimon-core .../iceberg/IcebergCommitCallback.java:102, field ids
  * and Avro layouts per IcebergManifestEntry.java:119,
  * IcebergDataFileMeta.java:293, IcebergManifestFileMeta.java:172 and
  * the public Iceberg spec):
  *  - append tables: every live data file;
  *  - primary-key tables: only fully-compacted (level >= 1) files —
  *    one merged, tombstone-free generation per bucket, so a
  *    merge-unaware external reader still sees correct rows (the
  *    reference exposes maxLevel files for exactly this reason,
  *    IcebergCommitCallback.java:734-741). Run `compact()` first.
  *
  * Data files are the SAME parquet/orc files graft reads — zero data
  * copying. Graft's hidden columns (_graft_seq/_graft_kind) are simply
  * absent from the exported Iceberg schema, and the
  * `schema.name-mapping.default` property maps column names to field
  * ids for files written without embedded ids, so spec-compliant
  * readers project only the logical columns.
  *
  * Each sync is one full metadata generation (metadata json + manifest
  * list + one manifest): O(live files) driver-side metadata, no Spark
  * job, no shuffle — the same cost class as a graft commit itself.
  */
object IcebergCompat {

  /** Write the Iceberg metadata tree for the table's latest snapshot.
    * @return path of the metadata json, None for an empty table */
  def sync(t: GraftTable): Option[String] = {
    val snap = t.sm.latestSnapshot().getOrElse(return None)
    val sch = t.schema
    val all = t.sm.liveEntries(snap)
    val exposed =
      if (sch.primaryKeys.isEmpty) all else all.filter(_.file.level >= 1)
    require(exposed.forall(_.file.dvFile.isEmpty),
      "deletion-vectored files cannot be exposed to Iceberg readers " +
        "(graft DVs are not Iceberg delete files); run full compaction first")
    val metaDir = new File(s"${t.path}/metadata")
    metaDir.mkdirs()
    val seq = snap.id
    val snapshotId = snap.id
    val commitUuid = UUID.randomUUID().toString

    val manifestName = s"graft-$commitUuid-m0.avro"
    val manifestPath = new File(metaDir, manifestName)
    writeManifest(manifestPath, t, sch, exposed, snapshotId, seq)

    val listName = s"snap-$snapshotId-$commitUuid.avro"
    val listPath = new File(metaDir, listName)
    writeManifestList(listPath, manifestPath, exposed, snapshotId, seq)

    val metadataJson = tableMetadata(t, sch, snap.timeMillis, snapshotId, seq,
      s"file://${listPath.getAbsolutePath}")
    val mdFile = new File(metaDir, s"v$seq.metadata.json")
    atomicWrite(mdFile, metadataJson)
    atomicWrite(new File(metaDir, "version-hint.text"), seq.toString)
    Some(mdFile.getAbsolutePath)
  }

  /** Resolve the data files the exported metadata exposes by walking
    * version-hint → metadata json → manifest list → manifests with
    * GENERIC readers (avro lib + json text), exactly like an external
    * Iceberg reader — deliberately independent of graft's own
    * snapshot/manifest classes. Returns local filesystem paths. */
  def externalDataFiles(tablePath: String): Seq[String] = {
    val metaDir = s"$tablePath/metadata"
    val version = new String(Files.readAllBytes(
      Paths.get(s"$metaDir/version-hint.text")), StandardCharsets.UTF_8).trim
    val md = new String(Files.readAllBytes(
      Paths.get(s"$metaDir/v$version.metadata.json")), StandardCharsets.UTF_8)
    val listPath = """"manifest-list":"file://([^"]+)"""".r
      .findFirstMatchIn(md).getOrElse(
        throw new IllegalStateException("metadata json has no manifest-list")).group(1)
    def readAvro(p: String): Seq[org.apache.avro.generic.GenericRecord] = {
      val r = new org.apache.avro.file.DataFileReader(
        new File(p),
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      try {
        val buf = Vector.newBuilder[org.apache.avro.generic.GenericRecord]
        while (r.hasNext) buf += r.next()
        buf.result()
      } finally r.close()
    }
    readAvro(listPath).flatMap { m =>
      readAvro(m.get("manifest_path").toString.stripPrefix("file://"))
        .map(_.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("file_path").toString.stripPrefix("file://"))
    }
  }

  // ---------- manifest (manifest_entry records) ----------

  private def writeManifest(
      out: File, t: GraftTable, sch: TableSchema,
      entries: Seq[ManifestEntry], snapshotId: Long, seq: Long): Unit = {
    val partFields = partitionFields(sch)
    val schema = new org.apache.avro.Schema.Parser().parse(manifestEntrySchema(partFields))
    val dataFileSchema = schema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    def mapSchema(field: String) = // non-null branch of the optional map
      dataFileSchema.getField(field).schema().getTypes.get(1)
    val (vcS, nvcS, lbS, ubS) = (mapSchema("value_counts"),
      mapSchema("null_value_counts"), mapSchema("lower_bounds"), mapSchema("upper_bounds"))
    val colDdl = sch.fields.map(f => f.name -> (f.id + 1, f.dataType)).toMap
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setMeta("schema", schemaJson(sch))
    w.setMeta("partition-spec", partitionSpecFieldsJson(sch))
    w.setMeta("partition-spec-id", "0")
    w.setMeta("format-version", "2")
    w.setMeta("content", "data")
    w.create(schema, out)
    def kv(s: org.apache.avro.Schema, k: Int, v: AnyRef): GenericRecord = {
      val r = new GenericData.Record(s.getElementType)
      r.put("key", Integer.valueOf(k)); r.put("value", v); r
    }
    try entries.foreach { e =>
      val part = new GenericData.Record(partSchema)
      partFields.foreach { case (name, ddl) =>
        part.put(name, e.partition.get(name).map(partitionValue(ddl, _)).orNull)
      }
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", 0)
      df.put("file_path", s"file://${new File(s"${t.path}/${e.file.fileName}").getAbsolutePath}")
      df.put("file_format", fileFormat(e.file.fileName))
      df.put("partition", part)
      df.put("record_count", java.lang.Long.valueOf(e.file.rowCount))
      df.put("file_size_in_bytes", java.lang.Long.valueOf(e.file.fileSize))
      // column stats → Iceberg data-skipping maps. Bounds use the
      // spec's single-value binary serialization (Appendix D);
      // columns whose stat strings don't round-trip are omitted —
      // omission is always safe for a reader.
      val stats = e.file.stats.toSeq.flatMap { case (name, cs) =>
        colDdl.get(name).map { case (cid, ddl) => (cid, ddl, cs) }
      }.sortBy(_._1)
      if (stats.nonEmpty) {
        df.put("value_counts", stats.map { case (cid, _, _) =>
          kv(vcS, cid, java.lang.Long.valueOf(e.file.rowCount)) }.asJava)
        df.put("null_value_counts", stats.map { case (cid, _, cs) =>
          kv(nvcS, cid, java.lang.Long.valueOf(cs.nullCount)) }.asJava)
        def boundsOf(pick: graft.core.Meta.ColStats => Option[String], s: org.apache.avro.Schema) = {
          val bs = stats.flatMap { case (cid, ddl, cs) =>
            pick(cs).flatMap(v => singleValueBytes(ddl, v)).map(kv(s, cid, _))
          }
          if (bs.isEmpty) null else bs.asJava
        }
        df.put("lower_bounds", boundsOf(_.min, lbS))
        df.put("upper_bounds", boundsOf(_.max, ubS))
      }
      val rec = new GenericData.Record(schema)
      rec.put("status", 1) // ADDED in this (full) metadata generation
      rec.put("snapshot_id", java.lang.Long.valueOf(snapshotId))
      rec.put("sequence_number", java.lang.Long.valueOf(seq))
      rec.put("file_sequence_number", java.lang.Long.valueOf(seq))
      rec.put("data_file", df)
      w.append(rec)
    } finally w.close()
  }

  /** Iceberg single-value serialization (spec Appendix D) of a graft
    * stringified stat; None for types whose strings don't round-trip
    * losslessly (decimals, timestamps). */
  private def singleValueBytes(ddl: String, v: String): Option[java.nio.ByteBuffer] = {
    def le(n: Int)(fill: java.nio.ByteBuffer => Unit): java.nio.ByteBuffer = {
      val b = java.nio.ByteBuffer.allocate(n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fill(b); b.flip(); b
    }
    try DataType.fromDDL(ddl) match {
      case LongType => Some(le(8)(_.putLong(v.toLong)))
      case IntegerType | ShortType | ByteType => Some(le(4)(_.putInt(v.toInt)))
      case DoubleType => Some(le(8)(_.putDouble(v.toDouble)))
      case FloatType => Some(le(4)(_.putFloat(v.toFloat)))
      case BooleanType => Some(le(1)(_.put(if (v.toBoolean) 1.toByte else 0.toByte)))
      case StringType => Some(java.nio.ByteBuffer.wrap(v.getBytes(StandardCharsets.UTF_8)))
      case DateType => Some(le(4)(_.putInt(java.time.LocalDate.parse(v).toEpochDay.toInt)))
      case _ => None
    } catch { case _: Exception => None }
  }

  /** manifest_entry Avro schema with the spec's reserved field ids
    * (status 0, snapshot_id 1, data_file 2 / content 134, file_path
    * 100, ... — Iceberg spec "Manifests"). */
  private def manifestEntrySchema(partFields: Seq[(String, String)]): String = {
    val partCols = partFields.zipWithIndex.map { case ((name, ddl), i) =>
      s"""{"name":${q(name)},"type":["null",${avroType(ddl)}],"default":null,"field-id":${1000 + i}}"""
    }.mkString(",")
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int","field-id":0},
       |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
       |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
       |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
       |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
       |{"name":"content","type":"int","field-id":134},
       |{"name":"file_path","type":"string","field-id":100},
       |{"name":"file_format","type":"string","field-id":101},
       |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$partCols]}},
       |{"name":"record_count","type":"long","field-id":103},
       |{"name":"file_size_in_bytes","type":"long","field-id":104},
       |${statMap("value_counts", 109, 119, 120, "long")},
       |${statMap("null_value_counts", 110, 121, 122, "long")},
       |${statMap("lower_bounds", 125, 126, 127, "bytes")},
       |${statMap("upper_bounds", 128, 129, 130, "bytes")}
       |]}}]}""".stripMargin.replace("\n", "")
  }

  /** Optional Iceberg map field in its avro form: an array of
    * key/value records tagged logicalType=map (spec ids: the maps are
    * 109/110/125/128 with per-entry key/value ids). */
  private def statMap(name: String, fid: Int, kid: Int, vid: Int, vtype: String): String =
    s"""{"name":"$name","field-id":$fid,"default":null,"type":["null",
       |{"type":"array","logicalType":"map","items":{"type":"record","name":"k${kid}_v$vid","fields":[
       |{"name":"key","type":"int","field-id":$kid},
       |{"name":"value","type":"$vtype","field-id":$vid}]}}]}""".stripMargin.replace("\n", "")

  // ---------- manifest list (manifest_file records) ----------

  private def writeManifestList(
      out: File, manifest: File, entries: Seq[ManifestEntry],
      snapshotId: Long, seq: Long): Unit = {
    val schema = new org.apache.avro.Schema.Parser().parse(manifestFileSchema)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setMeta("format-version", "2")
    w.setMeta("snapshot-id", snapshotId.toString)
    w.setMeta("sequence-number", seq.toString)
    w.create(schema, out)
    try {
      val rec = new GenericData.Record(schema)
      rec.put("manifest_path", s"file://${manifest.getAbsolutePath}")
      rec.put("manifest_length", java.lang.Long.valueOf(manifest.length()))
      rec.put("partition_spec_id", 0)
      rec.put("content", 0) // data
      rec.put("sequence_number", java.lang.Long.valueOf(seq))
      rec.put("min_sequence_number", java.lang.Long.valueOf(seq))
      rec.put("added_snapshot_id", java.lang.Long.valueOf(snapshotId))
      rec.put("added_files_count", Integer.valueOf(entries.size))
      rec.put("existing_files_count", Integer.valueOf(0))
      rec.put("deleted_files_count", Integer.valueOf(0))
      rec.put("added_rows_count", java.lang.Long.valueOf(entries.map(_.file.rowCount).sum))
      rec.put("existing_rows_count", java.lang.Long.valueOf(0L))
      rec.put("deleted_rows_count", java.lang.Long.valueOf(0L))
      rec.put("partitions", null)
      w.append(rec)
    } finally w.close()
  }

  /** manifest_file Avro schema (spec ids 500-517; names per the
    * current spec, not the pre-1.4 *_data_files_count aliases). */
  private val manifestFileSchema: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514},
      |{"name":"partitions","field-id":507,"type":["null",{"type":"array","element-id":508,
      |"items":{"type":"record","name":"r508","fields":[
      |{"name":"contains_null","type":"boolean","field-id":509},
      |{"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
      |{"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
      |{"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
      |]}}],"default":null}]}""".stripMargin.replace("\n", "")

  // ---------- table metadata json ----------

  private def tableMetadata(
      t: GraftTable, sch: TableSchema, timeMs: Long,
      snapshotId: Long, seq: Long, manifestListPath: String): String = {
    val tableUuid = UUID.nameUUIDFromBytes(
      new File(t.path).getAbsolutePath.getBytes(StandardCharsets.UTF_8))
    val specFields = partitionSpecFieldsJson(sch)
    val lastPartitionId = 999 + sch.partitionKeys.size
    val nameMapping = sch.fields.map(f =>
      s"""{"field-id":${f.id + 1},"names":[${q(f.name)}]}""").mkString("[", ",", "]")
    s"""{
       |"format-version":2,
       |"table-uuid":"$tableUuid",
       |"location":"file://${new File(t.path).getAbsolutePath}",
       |"last-sequence-number":$seq,
       |"last-updated-ms":$timeMs,
       |"last-column-id":${lastColumnId(sch)},
       |"current-schema-id":${sch.id},
       |"schemas":[${schemaJson(sch)}],
       |"default-spec-id":0,
       |"partition-specs":[{"spec-id":0,"fields":$specFields}],
       |"last-partition-id":$lastPartitionId,
       |"default-sort-order-id":0,
       |"sort-orders":[{"order-id":0,"fields":[]}],
       |"properties":{"schema.name-mapping.default":${q(nameMapping)}},
       |"current-snapshot-id":$snapshotId,
       |"snapshots":[{"sequence-number":$seq,"snapshot-id":$snapshotId,
       |"timestamp-ms":$timeMs,"summary":{"operation":"append"},
       |"manifest-list":${q(manifestListPath)},"schema-id":${sch.id}}],
       |"snapshot-log":[{"timestamp-ms":$timeMs,"snapshot-id":$snapshotId}],
       |"metadata-log":[]
       |}""".stripMargin
  }

  /** Iceberg schema json. Field ids are graft field ids + 1 (Iceberg
    * convention starts at 1); nested element/key/value ids are
    * assigned deterministically after the last top-level id. */
  private[sources] def schemaJson(sch: TableSchema): String = {
    var next = sch.fields.map(_.id + 1).max
    def alloc(): Int = { next += 1; next }
    val fields = sch.fields.map { f =>
      s"""{"id":${f.id + 1},"name":${q(f.name)},"required":${!f.nullable},""" +
        s""""type":${typeJson(DataType.fromDDL(f.dataType), () => alloc())}}"""
    }.mkString(",")
    s"""{"type":"struct","schema-id":${sch.id},"fields":[$fields]}"""
  }

  private def lastColumnId(sch: TableSchema): Int = {
    // re-run the same deterministic allocation schemaJson uses
    var next = sch.fields.map(_.id + 1).max
    def alloc(): Int = { next += 1; next }
    sch.fields.foreach(f => typeJson(DataType.fromDDL(f.dataType), () => alloc()))
    next
  }

  private def typeJson(dt: DataType, alloc: () => Int): String = dt match {
    case BooleanType => "\"boolean\""
    case IntegerType | ShortType | ByteType => "\"int\""
    case LongType => "\"long\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case StringType => "\"string\""
    case BinaryType => "\"binary\""
    case DateType => "\"date\""
    case TimestampType => "\"timestamptz\""
    case TimestampNTZType => "\"timestamp\""
    case d: DecimalType => s""""decimal(${d.precision}, ${d.scale})""""
    case a: ArrayType =>
      val id = alloc()
      s"""{"type":"list","element-id":$id,"element":${typeJson(a.elementType, alloc)},""" +
        s""""element-required":${!a.containsNull}}"""
    case m: MapType =>
      val (ki, vi) = (alloc(), alloc())
      s"""{"type":"map","key-id":$ki,"key":${typeJson(m.keyType, alloc)},""" +
        s""""value-id":$vi,"value":${typeJson(m.valueType, alloc)},""" +
        s""""value-required":${!m.valueContainsNull}}"""
    case s: StructType =>
      val fields = s.fields.map { f =>
        val id = alloc()
        s"""{"id":$id,"name":${q(f.name)},"required":${!f.nullable},""" +
          s""""type":${typeJson(f.dataType, alloc)}}"""
      }.mkString(",")
      s"""{"type":"struct","fields":[$fields]}"""
    case other =>
      throw new IllegalArgumentException(s"no Iceberg mapping for type $other")
  }

  // ---------- partition handling ----------

  private def partitionFields(sch: TableSchema): Seq[(String, String)] =
    sch.partitionKeys.map(k => k -> sch.fields.find(_.name == k).get.dataType)

  private def partitionSpecFieldsJson(sch: TableSchema): String =
    partitionFields(sch).zipWithIndex.map { case ((name, _), i) =>
      val srcId = sch.fields.find(_.name == name).get.id + 1
      s"""{"name":${q(name)},"transform":"identity","source-id":$srcId,"field-id":${1000 + i}}"""
    }.mkString("[", ",", "]")

  /** Avro type for an identity partition column. */
  private def avroType(ddl: String): String = DataType.fromDDL(ddl) match {
    case LongType => "\"long\""
    case IntegerType | ShortType | ByteType => "\"int\""
    case StringType => "\"string\""
    case DoubleType => "\"double\""
    case FloatType => "\"float\""
    case BooleanType => "\"boolean\""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg partition type $other")
  }

  /** Typed Avro value from graft's stringified partition value. */
  private def partitionValue(ddl: String, v: String): AnyRef = DataType.fromDDL(ddl) match {
    case LongType => java.lang.Long.valueOf(v)
    case IntegerType | ShortType | ByteType => Integer.valueOf(v)
    case StringType => v
    case DoubleType => java.lang.Double.valueOf(v)
    case FloatType => java.lang.Float.valueOf(v)
    case BooleanType => java.lang.Boolean.valueOf(v)
    case DateType => Integer.valueOf(java.time.LocalDate.parse(v).toEpochDay.toInt)
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg partition type $other")
  }

  private def fileFormat(name: String): String =
    if (name.endsWith(".orc")) "ORC"
    else if (name.endsWith(".avro")) "AVRO"
    else "PARQUET"

  // ---------- small helpers ----------

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def atomicWrite(f: File, content: String): Unit = {
    val tmp = Paths.get(f.getPath + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, f.toPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
