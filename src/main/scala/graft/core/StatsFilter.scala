package graft.core

import graft.core.Meta.{ColStats, DataFileMeta, TableSchema}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** File-level data skipping: decide from manifest min/max/null-count
  * stats whether a data file can possibly contain rows matching a
  * predicate. Mirrors the reference's stats-based manifest filtering
  * (paimon-core .../operation/AbstractFileStoreScan filterByStats /
  * SimpleStatsEvolution) against Catalyst expressions instead of a
  * custom predicate IR.
  *
  * Works on analyzed expressions: comparand sides only need to be
  * foldable (Literal, Cast(Literal), arithmetic on literals, ...).
  * Conservative: anything unrecognized returns "might match".
  */
object StatsFilter {

  /** @return false only if the file provably contains no matching row. */
  def mightMatch(expr: Expression, file: DataFileMeta, schema: TableSchema): Boolean =
    eval(expr, file)

  /** Attribute possibly wrapped in an ORDER-PRESERVING numeric
    * widening cast (reference: CastTransform predicates on the
    * attribute side). `CAST(c AS BIGINT/DOUBLE) op lit` then prunes
    * against c's stats compared in the cast's wider type — the raw
    * stat strings parse losslessly into the wider type. */
  private object AttrMaybeCast {
    def unapply(e: Expression): Option[(AttributeReference, DataType)] = e match {
      case a: AttributeReference => Some((a, a.dataType))
      case Cast(a: AttributeReference, dt, _, _) if widens(a.dataType, dt) =>
        Some((a, dt))
      case _ => None
    }
    /** Only EXACTLY-representable widenings qualify for this fast path,
      * because cmp() re-parses the raw stat string in the TARGET type:
      * Int→Float (>2^24), Long→Double (>2^53) and Float→Double (the
      * stat string "0.1" parses to 0.1d, but (double)0.1f is
      * 0.100000001...) would compare against a value that differs from
      * the true cast of the endpoint and wrong-prune. Those lossy
      * casts still prune CORRECTLY through the Mono path, which parses
      * the stat in the SOURCE type and evaluates the cast. */
    private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType | FloatType | DoubleType) => true
      case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
      case (IntegerType, LongType | DoubleType) => true
      case _ => false
    }
  }

  private def eval(expr: Expression, f: DataFileMeta): Boolean = expr match {
    case And(l, r) => eval(l, f) && eval(r, f)
    case Or(l, r) => eval(l, f) || eval(r, f)
    // constant predicate (e.g. an inverted transform proved
    // unsatisfiable): FALSE/NULL can never match a row
    case l: Literal if l.dataType == org.apache.spark.sql.types.BooleanType =>
      l.value == true
    // a column that is entirely null in this file can never satisfy a
    // null-rejecting comparison, whatever the other side evaluates to
    // (EqualNullSafe excluded: `c <=> null` DOES match null rows; only
    // shapes known to propagate null — attr, widening cast, monotone
    // chains — qualify, so e.g. coalesce(c, 'x') = 'x' is untouched)
    case bc: BinaryComparison if !bc.isInstanceOf[EqualNullSafe] &&
        Seq(bc.left, bc.right).exists(s =>
          !s.foldable && nullRejectingAttr(s).exists(allNull(_, f))) => false
    case In(e, _) if nullRejectingAttr(e).exists(allNull(_, f)) => false
    case InSet(e, _) if nullRejectingAttr(e).exists(allNull(_, f)) => false
    case StartsWith(e, _) if nullRejectingAttr(e).exists(allNull(_, f)) => false
    case Like(e, _, _) if nullRejectingAttr(e).exists(allNull(_, f)) => false
    // negations of null-rejecting comparisons are null-rejecting too
    // (null != lit is null, not true)
    case Not(bc: BinaryComparison) if !bc.isInstanceOf[EqualNullSafe] &&
        Seq(bc.left, bc.right).exists(s =>
          !s.foldable && nullRejectingAttr(s).exists(allNull(_, f))) => false
    case Not(In(e, _)) if nullRejectingAttr(e).exists(allNull(_, f)) => false
    case Not(InSet(e, _)) if nullRejectingAttr(e).exists(allNull(_, f)) => false
    case EqualTo(AttrMaybeCast(a, dt), r) if r.foldable =>
      range(a.name, f).forall { case (mn, mx) =>
        cmp(r.eval(), r.dataType, mn).forall(_ >= 0) &&
          cmp(r.eval(), r.dataType, mx).forall(_ <= 0) }
    case EqualTo(l, a @ AttrMaybeCast(_, _)) if l.foldable => eval(EqualTo(a, l), f)
    // null-safe equality: with a null literal it IS `IS NULL`; with a
    // non-null literal null rows fail it, so the EqualTo range test
    // applies unchanged
    case EqualNullSafe(AttrMaybeCast(a, dt), r) if r.foldable =>
      if (r.eval() == null) eval(IsNull(a), f) else eval(EqualTo(a, r), f)
    case EqualNullSafe(l, a @ AttrMaybeCast(_, _)) if l.foldable =>
      eval(EqualNullSafe(a, l), f)
    // `c != lit` refutes a file whose every value IS lit (min == max ==
    // lit; null rows fail != anyway, so the null count is irrelevant).
    // A null literal makes != never true -> every file refuted.
    case Not(EqualTo(AttrMaybeCast(a, dt), r)) if r.foldable =>
      val rv = r.eval()
      rv != null && range(a.name, f).forall { case (mn, mx) =>
        !(mn == mx && cmp(rv, r.dataType, mn).contains(0)) }
    case Not(EqualTo(l, a @ AttrMaybeCast(_, _))) if l.foldable =>
      eval(Not(EqualTo(a, l)), f)
    // NOT IN ≡ conjunction of !=: refuted when the file is constant
    // and that constant is in the list (a null element rides the
    // != rule above — NOT IN with a null is never true)
    case Not(In(a @ AttrMaybeCast(_, _), list)) if list.forall(_.foldable) =>
      list.forall(r => eval(Not(EqualTo(a, r)), f))
    case Not(InSet(AttrMaybeCast(a, dt), values)) =>
      !values.contains(null) && range(a.name, f).forall { case (mn, mx) =>
        !(mn == mx && values.exists(v =>
          v != null && cmp(v, dt, mn).contains(0))) }
    case GreaterThan(AttrMaybeCast(a, dt), r) if r.foldable =>
      range(a.name, f).forall { case (_, mx) => cmp(r.eval(), r.dataType, mx).forall(_ < 0) }
    case GreaterThanOrEqual(AttrMaybeCast(a, dt), r) if r.foldable =>
      range(a.name, f).forall { case (_, mx) => cmp(r.eval(), r.dataType, mx).forall(_ <= 0) }
    case LessThan(AttrMaybeCast(a, dt), r) if r.foldable =>
      range(a.name, f).forall { case (mn, _) => cmp(r.eval(), r.dataType, mn).forall(_ > 0) }
    case LessThanOrEqual(AttrMaybeCast(a, dt), r) if r.foldable =>
      range(a.name, f).forall { case (mn, _) => cmp(r.eval(), r.dataType, mn).forall(_ >= 0) }
    // flipped operand order
    case GreaterThan(l, a @ AttrMaybeCast(_, _)) if l.foldable => eval(LessThan(a, l), f)
    case GreaterThanOrEqual(l, a @ AttrMaybeCast(_, _)) if l.foldable => eval(LessThanOrEqual(a, l), f)
    case LessThan(l, a @ AttrMaybeCast(_, _)) if l.foldable => eval(GreaterThan(a, l), f)
    case LessThanOrEqual(l, a @ AttrMaybeCast(_, _)) if l.foldable => eval(GreaterThanOrEqual(a, l), f)
    case In(AttrMaybeCast(a, dt), list) if list.forall(_.foldable) =>
      list.exists { r =>
        range(a.name, f).forall { case (mn, mx) =>
          cmp(r.eval(), r.dataType, mn).forall(_ >= 0) &&
            cmp(r.eval(), r.dataType, mx).forall(_ <= 0) } }
    case InSet(AttrMaybeCast(a, dt), values) =>
      values.exists { v =>
        range(a.name, f).forall { case (mn, mx) =>
          cmp(v, dt, mn).forall(_ >= 0) && cmp(v, dt, mx).forall(_ <= 0) } }
    // LIKE 'abc%' analyzes to StartsWith: a file may contain a string
    // with prefix p iff stat_max >= p and the min's p-length prefix
    // is <= p (reference: LikeOptimization → StartsWith leaf)
    case StartsWith(a: AttributeReference, r) if r.foldable =>
      prefixMightMatch(a.name, Option(r.eval()).map(_.toString), f)
    // LIKE 'abc%' (pure-prefix pattern): equivalent to StartsWith.
    // (The optimizer's LikeSimplification would rewrite it, but we
    // evaluate analyzed expressions.)
    // only under the DEFAULT escape char: a custom ESCAPE would make
    // its escape sequences literal prefix bytes and wrong-prune
    case Like(a: AttributeReference, r, esc) if r.foldable && esc == '\\' =>
      Option(r.eval()).map(_.toString) match {
        case Some(p) if p.nonEmpty && p.endsWith("%") &&
            !p.dropRight(1).exists(c => c == '%' || c == '_' || c == '\\') =>
          prefixMightMatch(a.name, Some(p.dropRight(1)), f)
        case _ => true
      }
    // prune only on a PROVEN-zero null count — a negative count means
    // the writer recorded no null statistics (parquet getNumNulls is
    // -1 when unset), and trusting a fabricated zero would silently
    // empty `IS NULL` queries over stat-less files
    case IsNull(a: AttributeReference) =>
      f.stats.get(a.name).forall(_.nullCount != 0)
    case IsNotNull(a: AttributeReference) =>
      f.stats.get(a.name).forall(st => st.nullCount < f.rowCount || st.min.isDefined)
    // ---- monotonic field transforms: `g(c) op lit` prunes against
    // (g(min), g(max)) — year(d) >= 2024, date_trunc, widening date/
    // timestamp casts, ± literal arithmetic (reference: the transform-
    // aware predicates of the reference's predicate layer, e.g.
    // CastTransform / trunc partition-expressions)
    case EqualTo(g @ Mono(a), r) if r.foldable =>
      monoRange(a, g, f).forall { case (lo, hi) =>
        val rv = r.eval()
        rv == null || (ord(g.dataType, rv, lo).forall(_ >= 0) &&
          ord(g.dataType, rv, hi).forall(_ <= 0))
      }
    case EqualTo(r, g @ Mono(a)) if r.foldable => eval(EqualTo(g, r), f)
    case GreaterThan(g @ Mono(a), r) if r.foldable =>
      monoRange(a, g, f).forall { case (_, hi) =>
        val rv = r.eval(); rv == null || ord(g.dataType, rv, hi).forall(_ < 0) }
    case GreaterThanOrEqual(g @ Mono(a), r) if r.foldable =>
      monoRange(a, g, f).forall { case (_, hi) =>
        val rv = r.eval(); rv == null || ord(g.dataType, rv, hi).forall(_ <= 0) }
    case LessThan(g @ Mono(a), r) if r.foldable =>
      monoRange(a, g, f).forall { case (lo, _) =>
        val rv = r.eval(); rv == null || ord(g.dataType, rv, lo).forall(_ > 0) }
    case LessThanOrEqual(g @ Mono(a), r) if r.foldable =>
      monoRange(a, g, f).forall { case (lo, _) =>
        val rv = r.eval(); rv == null || ord(g.dataType, rv, lo).forall(_ >= 0) }
    case GreaterThan(r, g @ Mono(_)) if r.foldable => eval(LessThan(g, r), f)
    case GreaterThanOrEqual(r, g @ Mono(_)) if r.foldable => eval(LessThanOrEqual(g, r), f)
    case LessThan(r, g @ Mono(_)) if r.foldable => eval(GreaterThan(g, r), f)
    case LessThanOrEqual(r, g @ Mono(_)) if r.foldable => eval(GreaterThanOrEqual(g, r), f)
    case In(g @ Mono(a), list) if list.forall(_.foldable) =>
      monoRange(a, g, f).forall { case (lo, hi) =>
        list.exists { r =>
          val rv = r.eval()
          rv == null || (ord(g.dataType, rv, lo).forall(_ >= 0) &&
            ord(g.dataType, rv, hi).forall(_ <= 0))
        }
      }
    case _ => true // unsupported shape: cannot skip
  }

  /** A chain of order-monotonic nodes (either direction) over exactly
    * one attribute: composition of monotones is monotone, and the
    * endpoints are SORTED after evaluation, so decreasing chains (e.g.
    * `10 - c`) need no polarity tracking. Arithmetic is admitted only
    * in ANSI/TRY eval mode — ANSI overflow throws and TRY yields null
    * (both land on "might match"), while LEGACY silently wraps, which
    * would break monotonicity and prune wrongly. */
  private object Mono {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case Cast(c, dt, _, _) if monoCast(c.dataType, dt) => unapply(c)
      case Year(c) => unapply(c)
      case TruncDate(c, fmt) if fmt.foldable => unapply(c)
      case TruncTimestamp(fmt, c, _) if fmt.foldable => unapply(c)
      case DateAdd(c, d) if d.foldable => unapply(c)
      case DateSub(c, d) if d.foldable => unapply(c)
      case Add(l, r, m) if nonLegacy(m) && r.foldable => unapply(l)
      case Add(l, r, m) if nonLegacy(m) && l.foldable => unapply(r)
      case Subtract(l, r, m) if nonLegacy(m) && r.foldable => unapply(l)
      case Subtract(l, r, m) if nonLegacy(m) && l.foldable => unapply(r)
      case Multiply(l, r, m) if nonLegacy(m) && r.foldable => unapply(l)
      case Multiply(l, r, m) if nonLegacy(m) && l.foldable => unapply(r)
      // failOnError=false is LEGACY wraparound: -Long.MinValue wraps to
      // itself, breaking monotonicity at the endpoint — same reason the
      // binary arithmetic above requires non-LEGACY mode
      case UnaryMinus(c, failOnError) if failOnError => unapply(c)
      case _ => None
    }
    /** Spark 4.1 arithmetic carries a NumericEvalContext, not a bare
      * EvalMode — comparing the context against EvalMode.LEGACY would
      * ALWAYS be unequal, silently voiding the guard. */
    private def nonLegacy(ctx: NumericEvalContext): Boolean =
      ctx.evalMode != EvalMode.LEGACY

    /** casts that preserve order beyond the numeric widenings the
      * AttrMaybeCast fast path already covers */
    private def monoCast(from: DataType, to: DataType): Boolean = (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType | FloatType | DoubleType) => true
      case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
      case (IntegerType, LongType | FloatType | DoubleType) => true
      case (LongType, DoubleType) => true
      case (FloatType, DoubleType) => true
      case (DateType, TimestampType | TimestampNTZType) => true
      case (TimestampType, DateType) => true
      case (TimestampNTZType, DateType) => true
      case _ => false
    }
  }

  /** [min, max] of a monotonic transform over the file's stat range. */
  private def monoRange(
      a: AttributeReference, g: Expression, f: DataFileMeta): Option[(Any, Any)] =
    for {
      mnmx <- range(a.name, f)
      mn <- statInternal(mnmx._1, a.dataType)
      mx <- statInternal(mnmx._2, a.dataType)
      gmn <- evalAt(g, a, mn)
      gmx <- evalAt(g, a, mx)
      c <- ord(g.dataType, gmn, gmx)
    } yield if (c <= 0) (gmn, gmx) else (gmx, gmn)

  /** evaluate g with the attribute bound to an internal value; any
    * eval failure (ANSI overflow, bad unit, ...) → None → might match */
  private def evalAt(
      g: Expression, a: AttributeReference, v: Any): Option[Any] =
    try {
      val bound = g.transformUp {
        case ar: AttributeReference if ar.exprId == a.exprId =>
          Literal(v, ar.dataType)
      }
      Option(bound.eval(null))
    } catch { case _: Exception => None }

  /** parse a stringified stat into the column's internal value */
  private def statInternal(stat: String, dt: DataType): Option[Any] = try {
    dt match {
      case ByteType => Some(stat.toByte)
      case ShortType => Some(stat.toShort)
      case IntegerType => Some(stat.toInt)
      case LongType => Some(stat.toLong)
      case DateType => Some(stat.toInt) // days since epoch
      case TimestampType | TimestampNTZType => Some(stat.toLong) // micros
      case _: TimeType => Some(stat.toLong) // nanos-of-day
      case FloatType => Some(stat.toFloat)
      case DoubleType => Some(stat.toDouble)
      case d: DecimalType =>
        Some(org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(stat), d.precision, d.scale))
      case StringType =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(stat))
      case BooleanType => Some(stat.toBoolean)
      case _ => None
    }
  } catch { case _: Exception => None }

  /** compare two internal values; None = not comparable → might match */
  private def ord(dt: DataType, x: Any, y: Any): Option[Int] =
    if (x == null || y == null) None
    else try {
      Some(org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(dt).asInstanceOf[Ordering[Any]].compare(x, y))
    } catch { case _: Exception => None }

  /** p-prefixed strings all sort >= p and share p's leading BYTES.
    * Comparisons are UTF-8 byte order — the order parquet/Spark min/max
    * stats are computed in; Java's UTF-16 compareTo disagrees for
    * supplementary characters (U+10000 sorts below U+E000 in UTF-16 but
    * above in UTF-8) and would wrong-prune. */
  private def prefixMightMatch(
      col: String, prefix: Option[String], f: DataFileMeta): Boolean =
    prefix match {
      case None => true
      case Some(p) => range(col, f).forall { case (mn, mx) =>
        val pb = utf8(p)
        utf8Cmp(utf8(mx), pb) >= 0 && utf8Cmp(utf8(mn).take(pb.length), pb) <= 0
      }
    }

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private def utf8Cmp(a: Array[Byte], b: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(a, b)

  /** (min, max) stats of a column, if present and usable. */
  /** Shapes that propagate null from the attribute to the comparison
    * operand (null in → null out), making the enclosing comparison
    * null-rejecting on that attribute. */
  private def nullRejectingAttr(e: Expression): Option[String] = e match {
    case AttrMaybeCast(a, _) => Some(a.name)
    case Mono(a) => Some(a.name)
    case _ => None
  }

  /** True when the file's stats prove the column holds ONLY nulls.
    * min/max must also be absent: a writer that counted nulls wrongly
    * but recorded endpoints would otherwise flip correct results. */
  private def allNull(col: String, f: DataFileMeta): Boolean =
    f.rowCount > 0 && f.stats.get(col).exists(st =>
      st.min.isEmpty && st.max.isEmpty && st.nullCount >= f.rowCount)

  private def range(col: String, f: DataFileMeta): Option[(String, String)] =
    f.stats.get(col).flatMap {
      case ColStats(Some(mn), Some(mx), _) => Some((mn, mx))
      case _ => None
    }

  /** Compare a Catalyst internal value against a stringified stat
    * value. Returns Some(sign of (value - stat)), or None when the
    * type is not comparable against stats — None means "unknown", and
    * every caller treats it as might-match (never skips). A plain 0
    * default would be WRONG for strict inequalities: `cmp < 0` on 0 is
    * false, so an unknown type would prune every file. */
  private def cmp(v: Any, dt: DataType, stat: String): Option[Int] = try {
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(java.lang.Long.compare(v.asInstanceOf[Number].longValue(), stat.toLong))
      case DateType => // internal: days since epoch (Int)
        Some(java.lang.Long.compare(v.asInstanceOf[Number].longValue(), stat.toLong))
      case TimestampType | TimestampNTZType => // internal: micros (Long)
        Some(java.lang.Long.compare(v.asInstanceOf[Number].longValue(), stat.toLong))
      // internal: nanos-of-day (Long); ParquetStats normalizes TIME
      // footer stats (millis/micros/nanos per annotation) to nanos
      case _: TimeType =>
        Some(java.lang.Long.compare(v.asInstanceOf[Number].longValue(), stat.toLong))
      // compare floats AS floats: the stat string is Float.toString
      // ("0.1" → 0.1f exactly), but widening the value to double first
      // (0.1f → 0.10000000149) shifts it off the re-parsed stat and
      // wrong-prunes float equality
      case FloatType =>
        Some(java.lang.Float.compare(
          v.asInstanceOf[Number].floatValue(), stat.toFloat))
      case DoubleType =>
        Some(java.lang.Double.compare(v.asInstanceOf[Number].doubleValue(), stat.toDouble))
      // internal: Decimal; ParquetStats normalizes unscaled footer stats
      // to plain decimal strings via the annotation's scale
      case _: DecimalType =>
        Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.compareTo(new java.math.BigDecimal(stat)))
      // UTF-8 BYTE order — the order the stats were computed in; Java's
      // UTF-16 compareTo disagrees on supplementary characters
      case StringType =>
        Some(utf8Cmp(utf8(v.toString), utf8(stat)))
      case BooleanType =>
        Some(java.lang.Boolean.compare(v.asInstanceOf[Boolean], stat.toBoolean))
      case _ => None // unknown type: cannot compare → caller must not skip
    }
    // a malformed stat (foreign writer, corrupt footer) fails open for
    // THIS file instead of throwing the whole pruning pass open
  } catch { case _: Exception => None }
}
