package graft.core

import graft.core.Meta.ManifestEntry
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Per-file bloom-filter index sidecars (reference:
  * paimon-common .../fileindex/bloomfilter/BloomFilterFileIndex.java:48).
  *
  * Spark has no per-file index framework, so this is custom: at commit
  * time one distributed job groups the freshly written rows by
  * `_metadata.file_path` and folds each indexed column into a
  * `org.apache.spark.util.sketch.BloomFilter` (map-side partial
  * merge). The serialized filters live next to the data as
  * `index/<uuid>.bloom` and manifests carry column→sidecar pointers.
  * The planner consults them for equality/IN predicates that min/max
  * stats cannot refute — the classic point-lookup case where ranges
  * overlap but membership is sparse.
  *
  * Canonical form: values are indexed and probed as their Spark
  * `CAST(x AS STRING)` rendering, so write side (SQL cast) and probe
  * side (driver stringification of the literal) must agree — covered
  * for integral, string, boolean and decimal-free double columns.
  */
object BloomIndex {

  val OptionColumns = "file-index.bloom-filter.columns"
  val OptionItems = "file-index.bloom-filter.items"
  val DefaultItems = 100000L
  val Fpp = 0.01

  /** Aggregator folding canonical string values into a BloomFilter. */
  final class BloomAgg(expectedItems: Long)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expectedItems, Fpp)
    override def reduce(b: BloomFilter, a: String): BloomFilter = {
      if (a != null) b.putString(a)
      b
    }
    override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
      { b1.mergeInPlace(b2); b1 }
    override def finish(r: BloomFilter): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      r.writeTo(out)
      out.toByteArray
    }
    override def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization(classOf[BloomFilter])
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Canonical probe rendering of a Catalyst internal value; None when
    * the type's driver-side rendering can't be guaranteed to match the
    * SQL cast (then the index is simply not consulted). The column's
    * DECLARED type is required: date/timestamp internals are plain
    * Int/Long, indistinguishable from integer columns by value alone —
    * rendering a date literal as its epoch-day number while the build
    * side indexed "2024-01-01" would refute every matching file. */
  def canonical(v: Any, dt: org.apache.spark.sql.types.DataType): Option[String] = {
    import org.apache.spark.sql.types._
    if (v == null) None
    else dt match {
      case StringType => Some(v.toString)
      case BooleanType => Some(v.toString)
      case ByteType | ShortType | IntegerType | LongType => Some(v.toString)
      case DoubleType | FloatType => Some(v.toString)
      case DateType =>
        // CAST(date AS STRING) is the tz-free ISO local date — exactly
        // LocalDate's rendering, reproducible at probe time
        Some(java.time.LocalDate
          .ofEpochDay(v.asInstanceOf[Number].longValue()).toString)
      case _ => None // timestamps (tz-dependent) / decimals (scale): skip
    }
  }

  /** Decide whether a file might contain rows matching `cond`, given a
    * loader for its column blooms. Conservative: only top-level
    * conjuncts of the form attr = literal / attr IN (...) can refute.
    */
  def mightMatch(
      cond: Expression,
      indexedColumns: Set[String],
      load: String => Option[BloomFilter]): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).forall {
      // a disjunction matches if ANY branch might (each branch may
      // itself be a conjunction — recurse through the full evaluator)
      case Or(l, r) =>
        mightMatch(l, indexedColumns, load) || mightMatch(r, indexedColumns, load)
      case EqualTo(a: AttributeReference, r) if r.foldable && indexedColumns(a.name) =>
        probe(a.name, a.dataType, Seq(r.eval()), load)
      case EqualTo(l, a: AttributeReference) if l.foldable && indexedColumns(a.name) =>
        probe(a.name, a.dataType, Seq(l.eval()), load)
      case In(a: AttributeReference, list)
          if list.forall(_.foldable) && indexedColumns(a.name) =>
        probe(a.name, a.dataType, list.map(_.eval()), load)
      case InSet(a: AttributeReference, values) if indexedColumns(a.name) =>
        probe(a.name, a.dataType, values.toSeq, load)
      case _ => true
    }
  }

  /** true unless the bloom proves every candidate value absent. */
  private def probe(
      column: String, dt: org.apache.spark.sql.types.DataType, values: Seq[Any],
      load: String => Option[BloomFilter]): Boolean =
    load(column) match {
      case None => true
      case Some(bloom) =>
        values.exists(v => canonical(v, dt) match {
          case None => true // unprobeable value: cannot refute
          case Some(s) => bloom.mightContainString(s)
        })
    }
}
