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
    private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType | FloatType | DoubleType) => true
      case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
      case (IntegerType, LongType | FloatType | DoubleType) => true
      case (LongType, DoubleType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
  }

  private def eval(expr: Expression, f: DataFileMeta): Boolean = expr match {
    case And(l, r) => eval(l, f) && eval(r, f)
    case Or(l, r) => eval(l, f) || eval(r, f)
    case EqualTo(AttrMaybeCast(a, dt), r) if r.foldable =>
      range(a.name, f).forall { case (mn, mx) =>
        cmp(r.eval(), r.dataType, mn).forall(_ >= 0) &&
          cmp(r.eval(), r.dataType, mx).forall(_ <= 0) }
    case EqualTo(l, a @ AttrMaybeCast(_, _)) if l.foldable => eval(EqualTo(a, l), f)
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
    case Like(a: AttributeReference, r, _) if r.foldable =>
      Option(r.eval()).map(_.toString) match {
        case Some(p) if p.nonEmpty && p.endsWith("%") &&
            !p.dropRight(1).exists(c => c == '%' || c == '_' || c == '\\') =>
          prefixMightMatch(a.name, Some(p.dropRight(1)), f)
        case _ => true
      }
    case IsNull(a: AttributeReference) =>
      f.stats.get(a.name).forall(_.nullCount > 0)
    case IsNotNull(a: AttributeReference) =>
      f.stats.get(a.name).forall(st => st.nullCount < f.rowCount || st.min.isDefined)
    case _ => true // unsupported shape: cannot skip
  }

  /** p-prefixed strings all sort >= p and share p's first chars. */
  private def prefixMightMatch(
      col: String, prefix: Option[String], f: DataFileMeta): Boolean =
    prefix match {
      case None => true
      case Some(p) => range(col, f).forall { case (mn, mx) =>
        mx.compareTo(p) >= 0 && mn.take(p.length).compareTo(p) <= 0
      }
    }

  /** (min, max) stats of a column, if present and usable. */
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
  private def cmp(v: Any, dt: DataType, stat: String): Option[Int] = dt match {
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
    case FloatType | DoubleType =>
      Some(java.lang.Double.compare(v.asInstanceOf[Number].doubleValue(), stat.toDouble))
    // internal: Decimal; ParquetStats normalizes unscaled footer stats
    // to plain decimal strings via the annotation's scale
    case _: DecimalType =>
      Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.compareTo(new java.math.BigDecimal(stat)))
    case StringType =>
      Some(v.toString.compareTo(stat))
    case BooleanType =>
      Some(java.lang.Boolean.compare(v.asInstanceOf[Boolean], stat.toBoolean))
    case _ => None // unknown type: cannot compare → caller must not skip
  }
}
