package graft.core

import graft.core.Meta.{ColStats, TableSchema}
import org.apache.spark.sql.types.StringType

/** Manifest statistics density control (reference: paimon-api
  * CoreOptions METADATA_STATS_MODE `metadata.stats-mode` + per-field
  * `fields.<f>.stats-mode`, applied by SimpleStatsConverter /
  * SimpleColStatsCollector). Long string min/max dominate manifest
  * size on wide text tables — at millions of files that is driver
  * planning memory — so modes bound them per column:
  *
  *  - `full` (this engine's default): exact min/max + null counts
  *  - `truncate(N)`: STRING min/max cut to N code points; the max's
  *    last code point increments so it stays a true UPPER bound in
  *    UTF-8 byte order — pruning stays sound, just less tight. Other
  *    types keep full stats: they are fixed-width, and cutting a
  *    rendered number would change its VALUE, not its precision
  *    (numeric stats never truncate, matching the reference)
  *  - `counts`: null counts only (IS NULL pruning keeps working)
  *  - `none`: no stats entry at all — fail-open everywhere
  *
  * The reference defaults to truncate(16); this engine keeps `full`
  * (its parquet manifests compress repeated prefixes well) and offers
  * the modes for wide-string tables. Exact-value consumers
  * (statsMinMax aggregate pushdown) must decline columns whose mode is
  * not `full` — a truncated max is a bound, not a value.
  *
  * Loosening a mode back to `full` does not un-truncate stats already
  * in old manifests — rewrite them (compact / rescale) before exact
  * values flow again. ENFORCED: statsMinMax checks the mode of each
  * file's WRITE schema (field-id matched), so files written under a
  * non-full mode decline exact-value use even after the current option
  * flips back. Pruning is never affected: truncated stats are valid
  * bounds in every direction.
  */
object StatsModes {

  val OptionKey = "metadata.stats-mode"
  private val Suffix = ".stats-mode"
  private val TruncRe = """truncate\((\d+)\)""".r

  /** `metadata.stats-mode.per.level` = "0:none,3:truncate(16)":
    * per-LSM-level table default (reference: CoreOptions
    * METADATA_STATS_MODE_PER_LEVEL — level-0 churn rarely deserves
    * full stats). Per-field options still win over the level default. */
  private def levelDefault(sch: TableSchema, level: Int): Option[String] =
    sch.options.get("metadata.stats-mode.per.level").flatMap { spec =>
      spec.split(",").map(_.trim).filter(_.nonEmpty).flatMap { e =>
        e.split(":", 2) match {
          case Array(l, m) => Some(l.trim.toInt -> m.trim)
          case _ => throw new IllegalArgumentException(
            s"metadata.stats-mode.per.level entry '$e' is not 'level:mode'")
        }
      }.toMap.get(level)
    }

  /** column → effective mode, TYPE-DIRECTED (truncate on a non-string
    * column resolves to full). Empty map = everything full (the fast
    * path: callers skip per-file work entirely). Unknown modes throw —
    * at write time, not silently at read time. `level` (-1 = unknown)
    * resolves the per-level default;
    * `metadata.stats-keep-first-n-columns` then forces every column
    * past the first N (schema order) to `none` (reference:
    * METADATA_STATS_KEEP_FIRST_N_COLUMNS — wide tables keep stats for
    * their leading query columns only). */
  def columnModes(sch: TableSchema, level: Int = -1): Map[String, String] = {
    val table =
      (if (level >= 0) levelDefault(sch, level) else None)
        .getOrElse(sch.options.getOrElse(OptionKey, "full"))
    val perField = sch.options.collect {
      case (k, v) if k.startsWith("fields.") && k.endsWith(Suffix) =>
        k.stripPrefix("fields.").stripSuffix(Suffix) -> v
    }
    val keepFirst = sch.options.get("metadata.stats-keep-first-n-columns")
      .map(_.toInt).filter(_ >= 0)
    val dropped: Set[String] = keepFirst match {
      case Some(n) => sch.fields.drop(n).map(_.name).toSet
      case None => Set.empty
    }
    val resolved = sch.fields.map { f =>
      val mode =
        if (dropped(f.name)) "none"
        else perField.getOrElse(f.name, table).trim
      mode match {
        case "full" | "none" | "counts" => f.name -> mode
        case TruncRe(_) =>
          val isString = Meta.sparkTypeOf(f.dataType) == StringType
          f.name -> (if (isString) mode else "full")
        case other => throw new IllegalArgumentException(
          s"unknown stats-mode '$other' for column ${f.name} " +
            "(full | none | counts | truncate(N))")
      }
    }.toMap
    if (resolved.values.forall(_ == "full")) Map.empty else resolved
  }

  /** Apply pre-resolved modes to freshly collected file stats.
    * Executor-safe: `modes` is a plain string map. */
  /** One mode for EVERY column, type-directed like [[columnModes]]
    * (reference: CoreOptions CHANGELOG_FILE_STATS_MODE — changelog
    * files carry one stats mode, not the per-field table config).
    * "full" → empty map (the callers' fast path). */
  def uniformModes(sch: TableSchema, mode: String): Map[String, String] = {
    val m = mode.trim
    if (m == "full") return Map.empty
    sch.fields.map { f =>
      val eff = m match {
        case "none" | "counts" => m
        case TruncRe(_) =>
          if (Meta.sparkTypeOf(f.dataType) == StringType) m else "full"
        case other => throw new IllegalArgumentException(
          s"unknown stats mode: $other")
      }
      f.name -> eff
    }.toMap
  }

  def apply(stats: Map[String, ColStats], modes: Map[String, String]): Map[String, ColStats] =
    if (modes.isEmpty) stats
    else stats.flatMap { case (c, st) =>
      modes.getOrElse(c, "full") match {
        case "full" => Some(c -> st)
        case "none" => None
        case "counts" => Some(c -> st.copy(min = None, max = None))
        case TruncRe(n) => Some(c -> st.copy(
          min = st.min.map(truncateMin(_, n.toInt)),
          max = st.max.flatMap(truncateMax(_, n.toInt))))
        case other => throw new IllegalArgumentException(
          s"unknown stats-mode: $other")
      }
    }

  /** First n code points — a valid LOWER bound (a prefix sorts at or
    * below the original in UTF-8 byte order). */
  def truncateMin(s: String, n: Int): String =
    if (s.codePointCount(0, s.length) <= n) s
    else s.substring(0, s.offsetByCodePoints(0, n))

  /** First n code points with the LAST one incremented — every string
    * sharing the n-point prefix sorts strictly below it, so it is a
    * true upper bound. Increment skips the surrogate block (no such
    * code point exists in a string) and carries left past U+10FFFF;
    * None when no increment exists (all points at U+10FFFF). */
  def truncateMax(s: String, n: Int): Option[String] = {
    if (s.codePointCount(0, s.length) <= n) return Some(s)
    val it = s.codePoints().iterator()
    val cps = new Array[Int](n)
    var k = 0
    while (k < n) { cps(k) = it.nextInt(); k += 1 }
    var i = n - 1
    while (i >= 0) {
      val bumped = cps(i) + 1
      val next = if (bumped >= 0xD800 && bumped <= 0xDFFF) 0xE000 else bumped
      if (next <= 0x10FFFF) {
        val out = new java.lang.StringBuilder
        var j = 0
        while (j < i) { out.appendCodePoint(cps(j)); j += 1 }
        out.appendCodePoint(next)
        return Some(out.toString)
      }
      i -= 1
    }
    None
  }
}
