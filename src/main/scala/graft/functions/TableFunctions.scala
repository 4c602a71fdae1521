package graft.functions

import graft.table.GraftTable
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spark-registered helper functions of the reference
  * (paimon-spark .../catalog/functions/PaimonFunctions.scala:44-52):
  * `bucket`, `max_pt`. */
object TableFunctions {

  /** Bucket id a row would be written to — the same hash the writer
    * uses, usable for bucket-aligned repartitioning and joins. */
  def bucket(numBuckets: Int, keyCols: Column*): Column =
    pmod(xxhash64(keyCols: _*), lit(numBuckets)).cast("int")

  /** Latest non-empty partition value of a partition column
    * (reference: max_pt — answered from manifests, no data read). */
  def maxPt(table: GraftTable, partitionColumn: String): Option[String] = {
    require(table.schema.partitionKeys.contains(partitionColumn),
      s"$partitionColumn is not a partition key")
    maxPt(table.sm, partitionColumn)
  }

  /** Metadata-only variant: needs no SparkSession, usable inside
    * executor-evaluated catalog functions. */
  def maxPt(sm: graft.core.SnapshotManager, partitionColumn: String): Option[String] = {
    val entries = sm.latestSnapshot().map(sm.liveEntries).getOrElse(Seq.empty)
    entries
      .filter(e => e.file.rowCount - e.file.dvCardinality.getOrElse(0L) > 0)
      .flatMap(_.partition.get(partitionColumn))
      .maxOption
  }
}
