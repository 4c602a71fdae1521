package graft.core

import graft.core.Meta.{ColStats, DataFileMeta}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.{BooleanColumnStatistics, ColumnStatistics, DateColumnStatistics, DoubleColumnStatistics, IntegerColumnStatistics, OrcFile, StringColumnStatistics, TimestampColumnStatistics}
import scala.jdk.CollectionConverters._

/** Footer-only statistics extraction for ORC data files — the ORC
  * sibling of [[ParquetStats]] (reference: paimon-format
  * .../orc/OrcFileFormat.java:63 + OrcSimpleStatsExtractor).
  *
  * Min/max are stringified in the same internal-comparable form the
  * manifest carries for parquet files: integers (incl. date days) as
  * Long strings, floats as Double strings, timestamps as micros, UTF8
  * strings raw — StatsFilter re-types them via the table schema, so
  * pruning is format-agnostic. */
object OrcStats {

  def read(
      conf: Configuration,
      absolutePath: String,
      relativeName: String,
      level: Int,
      minSeq: Long,
      maxSeq: Long): DataFileMeta = {
    val reader = OrcFile.createReader(
      new Path(absolutePath), OrcFile.readerOptions(conf))
    try {
      val schema = reader.getSchema
      val stats = reader.getStatistics
      val rowCount = reader.getNumberOfRows
      val names = schema.getFieldNames.asScala.toSeq
      val children = schema.getChildren.asScala.toSeq
      val colStats = names.zip(children).flatMap { case (name, child) =>
        val s = stats(child.getId)
        val (mn, mx) = minMax(s)
        val nulls =
          if (s.hasNull) rowCount - s.getNumberOfValues else 0L
        // a column with no usable min/max still contributes null counts
        Some(name -> ColStats(mn, mx, nulls))
      }.toMap
      DataFileMeta(relativeName, reader.getContentLength, rowCount,
        minSeq, maxSeq, level, colStats,
        creationTime = Some(System.currentTimeMillis()))
    } finally reader.close()
  }

  private def minMax(s: ColumnStatistics): (Option[String], Option[String]) =
    if (s.getNumberOfValues == 0) (None, None)
    else s match {
      case i: IntegerColumnStatistics =>
        (Some(i.getMinimum.toString), Some(i.getMaximum.toString))
      case d: DoubleColumnStatistics =>
        (Some(d.getMinimum.toString), Some(d.getMaximum.toString))
      case st: StringColumnStatistics =>
        (Option(st.getMinimum), Option(st.getMaximum))
      case dt: DateColumnStatistics =>
        // days since epoch — matches the parquet DATE stat form
        (Option(dt.getMinimumDayOfEpoch.toString),
          Option(dt.getMaximumDayOfEpoch.toString))
      case ts: TimestampColumnStatistics =>
        // ORC stats are millis; widen to a safe micros envelope
        // (floor the min, ceil the max) so pruning never refutes a
        // file holding a sub-millisecond extreme
        (Option(ts.getMinimum).map(t => (t.getTime * 1000L).toString),
          Option(ts.getMaximum).map(t => ((t.getTime + 1) * 1000L - 1).toString))
      case _: BooleanColumnStatistics => (None, None)
      case _ => (None, None) // decimals/binary: no skipping stats
    }
}
