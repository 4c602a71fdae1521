package graft.core

import graft.core.Meta.{ColStats, DataFileMeta, ManifestEntry, TableSchema}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Per-entry prune evaluation: file stats + partition point-ranges +
  * bloom/bitmap/BSI index sidecar probes, shared by the driver-side
  * planning loop and the distributed pruning job (reference: the
  * manifest-entry filters of paimon-core
  * .../operation/AbstractFileStoreScan, evaluated in parallel by
  * SnapshotReaderImpl).
  */
object PruneEval {

  /** Lazily loaded, cached, decoded index sidecars keyed by sidecar
    * path. One instance per GraftTable on the driver; one JVM-global
    * instance on executors. */
  final class SidecarCaches {
    val bloom = scala.collection.concurrent.TrieMap
      .empty[String, org.apache.spark.util.sketch.BloomFilter]
    val bitmap = scala.collection.concurrent.TrieMap.empty[String, BitmapIndex.Decoded]
    val bsi = scala.collection.concurrent.TrieMap.empty[String, BsiIndex.Decoded]
    val range = scala.collection.concurrent.TrieMap.empty[String, RangeIndex.Decoded]
    /** crude bound: sidecars are per-file, so a huge table could
      * otherwise pin unbounded decoded indexes */
    def boundedPut(): Unit = {
      if (bloom.size > 4096) bloom.clear()
      if (bitmap.size > 4096) bitmap.clear()
      if (bsi.size > 4096) bsi.clear()
      if (range.size > 4096) range.clear()
    }
  }

  /** Executor-side cache, shared across tasks in one executor JVM. */
  lazy val jvmCaches = new SidecarCaches

  /** Remap an entry's stats/index-file keys from its write-time schema
    * to current column names (schema evolution by field id; reference:
    * SchemaEvolutionUtil / SimpleStatsEvolutions). */
  def remap(e: ManifestEntry, cur: TableSchema, byId: Long => TableSchema): DataFileMeta = {
    if (e.file.schemaId == cur.id) return e.file
    val old = byId(e.file.schemaId)
    val oldNameById = old.fields.map(f => f.id -> f.name).toMap
    def rm[V](m: Map[String, V]): Map[String, V] =
      cur.fields.flatMap { f =>
        oldNameById.get(f.id).flatMap(m.get).map(f.name -> _)
      }.toMap
    e.file.copy(stats = rm(e.file.stats), indexFiles = e.file.indexFiles.map(rm))
  }

  /** @return false only if the file provably contains no matching row.
    * Throws on evaluator bugs — callers decide the fail-open policy. */
  def keep(
      cond: Expression,
      e: ManifestEntry,
      cur: TableSchema,
      byId: Long => TableSchema,
      tablePath: String,
      io: FileIO,
      caches: SidecarCaches): Boolean = {
    // fold partition values into the stats map as point ranges so one
    // evaluator covers both partition and stats pruning
    val partStats = e.partition.map { case (k, v) =>
      k -> ColStats(Some(v), Some(v), 0L)
    }
    val base = remap(e, cur, byId)
    val augmented = base.copy(stats = base.stats ++ partStats)
    StatsFilter.mightMatch(cond, augmented, cur) && {
      // index sidecars refine point predicates where ranges overlap:
      // bloom approximately, bitmap/BSI exactly. A sidecar is consulted
      // only while its column is STILL LISTED in the table option —
      // widenColumn strips widened columns from the lists because their
      // stored canonical encodings no longer match probe-time
      // canonicalization (e.g. bitmap "5" vs probe "5.0"); stale
      // sidecars then fail open instead of wrong-pruning.
      val idx = base.indexFiles.getOrElse(Map.empty)
      def optCols(option: String): Set[String] = cur.options.get(option)
        .map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty)
      def live(suffix: String, option: String): Map[String, String] = {
        val cols = optCols(option)
        idx.filter { case (c, p) => p.endsWith(suffix) && cols(c) }
      }
      val bloomIdx = live(".bloom", BloomIndex.OptionColumns)
      val bitmapIdx = live(".bitmap", BitmapIndex.OptionColumns)
      val bsiIdx = live(".bsi", BsiIndex.OptionColumns)
      val rangeIdx = live(".range", RangeIndex.OptionColumns)
      caches.boundedPut()
      (bloomIdx.isEmpty || BloomIndex.mightMatch(cond, bloomIdx.keySet,
        col => bloomIdx.get(col).map(rel =>
          caches.bloom.getOrElseUpdate(rel,
            BloomIndex.deserialize(io.readBytes(s"$tablePath/$rel")))))) &&
      (bitmapIdx.isEmpty || BitmapIndex.mightMatch(cond, bitmapIdx.keySet,
        col => bitmapIdx.get(col).map(rel =>
          caches.bitmap.getOrElseUpdate(rel,
            BitmapIndex.deserialize(io.readBytes(s"$tablePath/$rel")))))) &&
      (bsiIdx.isEmpty || BsiIndex.mightMatch(cond, bsiIdx.keySet,
        col => bsiIdx.get(col).map(rel =>
          caches.bsi.getOrElseUpdate(rel,
            BsiIndex.deserialize(io.readBytes(s"$tablePath/$rel")))))) &&
      (rangeIdx.isEmpty || RangeIndex.mightMatch(cond, rangeIdx.keySet,
        col => cur.fields.find(_.name == col).map(f =>
          graft.core.Meta.sparkTypeOf(f.dataType)),
        col => rangeIdx.get(col).map(rel =>
          caches.range.getOrElseUpdate(rel,
            RangeIndex.deserialize(io.readBytes(s"$tablePath/$rel"))))))
    }
  }
}
