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

  // --- MULTISET<T> (reference: paimon-api MultisetType.java; stored
  // as MAP<T, INT> per SURVEY §1.2's Flink-style mapping) -------------

  /** Build a MULTISET (element → multiplicity map) from an array
    * column. Pure expressions (aggregate over the distinct elements) —
    * codegen-friendly, no UDF. Null elements are not representable as
    * map keys and are dropped, matching SQL MULTISET semantics for
    * collections built from nullable input. */
  def multiset(arr: Column): Column = {
    val clean = filter(arr, _.isNotNull)
    map_from_arrays(
      array_distinct(clean),
      transform(array_distinct(clean),
        x => size(filter(clean, y => y === x))))
  }

  /** Total multiplicity of a MULTISET (its cardinality as a bag). */
  def multisetCardinality(ms: Column): Column =
    coalesce(aggregate(map_values(ms), lit(0), (acc, v) => acc + v), lit(0))

  /** Bag union of two MULTISETs: per-element multiplicities add. */
  def multisetUnion(a: Column, b: Column): Column =
    map_zip_with(a, b, (_, x, y) => coalesce(x, lit(0)) + coalesce(y, lit(0)))
}
