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
      * otherwise pin unbounded decoded indexes. TrieMap.size is O(n),
      * so the check runs every 64th call instead of per manifest entry
      * (the bound overshoots by at most a few dozen decodes). */
    private val tick = new java.util.concurrent.atomic.AtomicLong()
    def boundedPut(): Unit = if ((tick.incrementAndGet() & 63L) == 0L) {
      if (bloom.size > 4096) bloom.clear()
      if (bitmap.size > 4096) bitmap.clear()
      if (bsi.size > 4096) bsi.clear()
      if (range.size > 4096) range.clear()
    }
  }

  /** Executor-side cache, shared across tasks in one executor JVM. */
  lazy val jvmCaches = new SidecarCaches

  // keyed by (table, schema id, option) — schema ids start at 0 in
  // EVERY table, so an id-only key would leak one table's column list
  // into another's pruning pass
  private val optColsCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, String), Set[String]]

  /** One partition-directory value as (Some(statString) | None-for-null),
    * or outer None when it cannot be decoded for the declared type. */
  private def partStat(
      raw: String, dt: org.apache.spark.sql.types.DataType): Option[Option[String]] =
    try {
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      import org.apache.spark.sql.types._
      val unescaped = ExternalCatalogUtils.unescapePathName(raw)
      if (unescaped == ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
        return Some(None)
      val u8 = org.apache.spark.unsafe.types.UTF8String.fromString(unescaped)
      val internal = dt match {
        case StringType => u8
        case _ => org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.Literal(u8, StringType), dt,
          Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
          .eval()
      }
      if (internal == null) None // unparseable: do not fold, fail open
      else Some(Some(dt match {
        case _: DecimalType => internal
          .asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.toPlainString
        case _ => internal.toString // Int days / Long micros / numbers / bool
      }))
    } catch { case _: Exception => None }

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
    // evaluator covers both partition and stats pruning. Values are
    // DECODED exactly like the read path (GraftScanUtil.partitionValue)
    // and re-rendered in the internal stat form cmp() parses — folding
    // the raw directory string would disagree with the scan: Hive
    // escapes ("a%3Ab"), the null sentinel matched as text, and date/
    // timestamp DISPLAY strings that don't parse as internal longs.
    val partStats = e.partition.flatMap { case (k, v) =>
      cur.fields.find(_.name == k).flatMap { f =>
        partStat(v, Meta.sparkTypeOf(f.dataType)).map {
          case Some(stat) => k -> ColStats(Some(stat), Some(stat), 0L)
          case None => // the whole file sits in the NULL partition
            k -> ColStats(None, None, math.max(e.file.rowCount, 1L))
        }
      } // unknown column / undecodable value: not folded — fail open
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
      // memoized per (schema id, option): the split/trim is otherwise
      // recomputed for EVERY manifest entry of a planning pass
      def optCols(option: String): Set[String] =
        optColsCache.getOrElseUpdate((tablePath, cur.id, option), {
          if (optColsCache.size > 1024) optColsCache.clear() // schema churn
          cur.options.get(option)
            .map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSet)
            .getOrElse(Set.empty)
        })
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
