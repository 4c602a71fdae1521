package graft.core

import graft.core.Meta.{ColStats, DataFileMeta}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation
import scala.jdk.CollectionConverters._

/** Footer-only statistics extraction for freshly written data files.
  *
  * Reads parquet footers (metadata pages, not row data) on the driver
  * to build the per-file min/max/null-count stats the manifest carries
  * for data skipping — the same stats source the reference persists in
  * manifests (paimon-core .../io/DataFileMeta valueStats via
  * SimpleStatsExtractor).
  *
  * Min/max are stringified in an internal-comparable form keyed by the
  * parquet physical type: integers (incl. date days / timestamp
  * micros) as Long strings, floats as Double strings, UTF8 binaries as
  * raw strings. StatsFilter re-types them via the table schema.
  */
/** Hadoop Configuration is not Serializable; wrap it for shipping into
  * executor-side footer-stat tasks (same shape as Spark's internal
  * SerializableConfiguration, which is private[spark]). */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object ParquetStats {

  def read(
      conf: Configuration,
      absolutePath: String,
      relativeName: String,
      level: Int,
      minSeq: Long,
      maxSeq: Long): DataFileMeta = {
    val file = HadoopInputFile.fromPath(new Path(absolutePath), conf)
    val reader = ParquetFileReader.open(file)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      val fileSize = file.getLength

      val colStats = scala.collection.mutable.Map[String, ColStats]()
      for (block <- blocks; chunk <- block.getColumns.asScala) {
        val name = chunk.getPath.toDotString
        if (!chunk.getPath.asScala.toSeq.exists(_ == "list")) { // top-level only
          val st = chunk.getStatistics
          val primitive = chunk.getPrimitiveType
          val (mn, mx): (Option[String], Option[String]) =
            if (st == null || !st.hasNonNullValue) (None, None)
            else stringify(primitive.getPrimitiveTypeName,
              primitive.getLogicalTypeAnnotation,
              st.genericGetMin.asInstanceOf[AnyRef],
              st.genericGetMax.asInstanceOf[AnyRef])
          val nulls = if (st == null) 0L else st.getNumNulls
          val merged = colStats.get(name) match {
            case None => ColStats(mn, mx, nulls)
            case Some(prev) =>
              ColStats(
                mergeMinMax(prev.min, mn, isMin = true, primitive.getPrimitiveTypeName),
                mergeMinMax(prev.max, mx, isMin = false, primitive.getPrimitiveTypeName),
                prev.nullCount + nulls)
          }
          colStats(name) = merged
        }
      }
      DataFileMeta(relativeName, fileSize, rowCount, minSeq, maxSeq, level,
        colStats.toMap)
    } finally reader.close()
  }

  private def stringify(
      t: PrimitiveTypeName,
      logical: LogicalTypeAnnotation,
      mn: AnyRef,
      mx: AnyRef): (Option[String], Option[String]) = t match {
    case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
      (Some(mn.toString), Some(mx.toString))
    case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
      (Some(mn.toString), Some(mx.toString))
    case PrimitiveTypeName.BOOLEAN =>
      (Some(mn.toString), Some(mx.toString))
    case PrimitiveTypeName.BINARY
        if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
      (Some(mn.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8),
        Some(mx.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8))
    case _ => (None, None) // unsupported for skipping: no stats
  }

  private def mergeMinMax(
      a: Option[String], b: Option[String], isMin: Boolean,
      t: PrimitiveTypeName): Option[String] = (a, b) match {
    case (None, x) => None // any statless block poisons the file stats
    case (x, None) => None
    case (Some(x), Some(y)) =>
      val cmp = t match {
        case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
          java.lang.Long.compare(x.toLong, y.toLong)
        case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
          java.lang.Double.compare(x.toDouble, y.toDouble)
        case _ => x.compareTo(y)
      }
      Some(if ((cmp <= 0) == isMin) x else y)
  }
}
