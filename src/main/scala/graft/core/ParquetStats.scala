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
          // -1 = UNKNOWN (no statistics recorded), never a fabricated
          // zero: IS NULL pruning trusts an exact zero, and a stat-less
          // chunk full of nulls would otherwise silently vanish
          val nulls =
            if (st == null || !st.isNumNullsSet) -1L else st.getNumNulls
          val merged = colStats.get(name) match {
            case None => ColStats(mn, mx, nulls)
            case Some(prev) =>
              val numeric = isNumericStat(primitive.getPrimitiveTypeName,
                primitive.getLogicalTypeAnnotation)
              ColStats(
                mergeMinMax(prev.min, mn, isMin = true, numeric),
                mergeMinMax(prev.max, mx, isMin = false, numeric),
                if (prev.nullCount < 0 || nulls < 0) -1L
                else prev.nullCount + nulls)
          }
          colStats(name) = merged
        }
      }
      DataFileMeta(relativeName, fileSize, rowCount, minSeq, maxSeq, level,
        colStats.toMap, creationTime = Some(System.currentTimeMillis()))
    } finally reader.close()
  }

  private def stringify(
      t: PrimitiveTypeName,
      logical: LogicalTypeAnnotation,
      mn: AnyRef,
      mx: AnyRef): (Option[String], Option[String]) = (t, logical) match {
    // TIME columns: physical values are millis (INT32) / micros / nanos
    // (INT64) of day per the annotation's unit; normalize to
    // nanos-of-day so stats match Spark's TimeType internal unit and
    // StatsFilter can compare Longs directly.
    case (PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64,
        tl: LogicalTypeAnnotation.TimeLogicalTypeAnnotation) =>
      import LogicalTypeAnnotation.TimeUnit
      val factor = tl.getUnit match {
        case TimeUnit.MILLIS => 1000000L
        case TimeUnit.MICROS => 1000L
        case _ => 1L
      }
      def nanos(v: AnyRef) = v.asInstanceOf[Number].longValue() * factor
      (Some(nanos(mn).toString), Some(nanos(mx).toString))
    // DECIMAL columns: physical values are unscaled ints (INT32/INT64)
    // or big-endian unscaled bytes (BINARY/FIXED); normalize to plain
    // decimal strings via the annotation's scale.
    case (_, dl: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
      def dec(v: AnyRef): Option[String] = v match {
        case n: Number =>
          Some(java.math.BigDecimal.valueOf(n.longValue(), dl.getScale).toPlainString)
        case b: org.apache.parquet.io.api.Binary =>
          Some(new java.math.BigDecimal(
            new java.math.BigInteger(b.getBytes), dl.getScale).toPlainString)
        case _ => None
      }
      (dec(mn), dec(mx))
    case (PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64, _) =>
      (Some(mn.toString), Some(mx.toString))
    case (PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE, _) =>
      (Some(mn.toString), Some(mx.toString))
    case (PrimitiveTypeName.BOOLEAN, _) =>
      (Some(mn.toString), Some(mx.toString))
    case (PrimitiveTypeName.BINARY, _)
        if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
      (Some(mn.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8),
        Some(mx.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8))
    case _ => (None, None) // unsupported for skipping: no stats
  }

  /** Stats whose stringified form compares numerically: plain ints /
    * floats, plus DECIMAL-annotated columns of any physical type
    * (stringify normalizes those to plain decimal strings). */
  private def isNumericStat(
      t: PrimitiveTypeName, logical: LogicalTypeAnnotation): Boolean =
    logical.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation] ||
      (t match {
        case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 |
             PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE => true
        case _ => false
      })

  private def mergeMinMax(
      a: Option[String], b: Option[String], isMin: Boolean,
      numeric: Boolean): Option[String] = (a, b) match {
    case (None, x) => None // any statless block poisons the file stats
    case (x, None) => None
    case (Some(x), Some(y)) =>
      val cmp =
        if (numeric)
          // exact for ints/decimals; Infinity/NaN (double stats) fall
          // back to Double semantics
          try new java.math.BigDecimal(x).compareTo(new java.math.BigDecimal(y))
          catch { case _: NumberFormatException =>
            java.lang.Double.compare(x.toDouble, y.toDouble) }
        else
          // UTF-8 BYTE order, matching how parquet computed the block
          // stats — UTF-16 compareTo disagrees on supplementary chars
          java.util.Arrays.compareUnsigned(
            x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Some(if ((cmp <= 0) == isMin) x else y)
  }
}
