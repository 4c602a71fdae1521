package graft.core

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.roaringbitmap.RoaringBitmap
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Per-file bitmap index sidecars (reference: paimon-common
  * .../fileindex/bitmap/BitmapFileIndex.java:49).
  *
  * For each indexed low-cardinality column the sidecar stores, per
  * distinct value, a RoaringBitmap of the row positions holding it
  * (plus one bitmap for nulls). Unlike the bloom index this is EXACT:
  * equality / IN / IS NULL / NOT-equal predicates refute files with no
  * false-positive slack, and the positions could drive row-range
  * skipping inside a file. Cardinality above `MaxCardinality` aborts
  * the index for that (file, column) — high-NDV columns belong to the
  * bloom index instead.
  *
  * Build: same distributed shape as the bloom index — one commit-time
  * job grouping fresh rows by `_metadata.file_path`, folding
  * (value, row_index) pairs into per-value bitmaps with map-side
  * partial merge; executors write the sidecars, only paths return.
  */
object BitmapIndex {

  val OptionColumns = "file-index.bitmap.columns"
  val MaxCardinality = 10000
  /** dictionary keys reserved for null rows / overflow marker; VALUE
    * keys carry [[ValuePrefix]] so a legal string value equal to the
    * null sentinel cannot be misfiled into the nulls bitmap (the same
    * hazard RangeIndex's "v" prefix guards) */
  private val NullKey = "\u0000null"
  private val OverflowKey = "\u0000overflow"
  private val ValuePrefix = "\u0001"
  /** serialization marker for the prefixed-key format; the v1 layout
    * started with a non-negative size, so the sign disambiguates */
  private val FormatV2 = -2

  /** (canonical value or null, rowIndex) → per-value position bitmaps. */
  final class BitmapAgg
      extends Aggregator[(String, Long), scala.collection.mutable.HashMap[String, RoaringBitmap], Array[Byte]] {
    type Buf = scala.collection.mutable.HashMap[String, RoaringBitmap]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, in: (String, Long)): Buf = {
      if (b.contains(OverflowKey)) return b
      val key = in._1 match {
        case null => NullKey
        case v => ValuePrefix + v // never collides with the sentinels
      }
      require(in._2 <= Int.MaxValue, "row index exceeds 32-bit bitmap")
      b.getOrElseUpdate(key, new RoaringBitmap()).add(in._2.toInt)
      if (b.size > MaxCardinality) { b.clear(); b(OverflowKey) = new RoaringBitmap() }
      b
    }
    override def merge(b1: Buf, b2: Buf): Buf = {
      if (b1.contains(OverflowKey)) return b1
      if (b2.contains(OverflowKey)) return b2
      b2.foreach { case (k, bm) =>
        b1.get(k) match {
          case Some(acc) => acc.or(bm)
          case None => b1(k) = bm
        }
      }
      if (b1.size > MaxCardinality) { b1.clear(); b1(OverflowKey) = new RoaringBitmap() }
      b1
    }
    override def finish(r: Buf): Array[Byte] =
      if (r.contains(OverflowKey)) Array.empty else serialize(r.toMap)
    override def bufferEncoder: Encoder[Buf] =
      Encoders.javaSerialization(classOf[Buf])
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def serialize(m: Map[String, RoaringBitmap]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(FormatV2)
    out.writeInt(m.size)
    m.foreach { case (k, bm) =>
      out.writeUTF(k)
      bm.runOptimize()
      val bb = new ByteArrayOutputStream()
      bm.serialize(new DataOutputStream(bb))
      val bytes = bb.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    bos.toByteArray
  }

  /** Decoded sidecar: value dictionary → position bitmaps; `nulls` is
    * the null-row bitmap. */
  final case class Decoded(values: Map[String, RoaringBitmap], nulls: RoaringBitmap)

  def deserialize(bytes: Array[Byte]): Decoded = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val first = in.readInt()
    val v2 = first == FormatV2
    val n = if (v2) in.readInt() else first
    val m = (0 until n).map { _ =>
      val k = in.readUTF()
      val len = in.readInt()
      val bb = new Array[Byte](len)
      in.readFully(bb)
      val bm = new RoaringBitmap()
      bm.deserialize(new DataInputStream(new ByteArrayInputStream(bb)))
      k -> bm
    }.toMap
    if (v2)
      Decoded(
        m.collect { case (k, bm) if k.startsWith(ValuePrefix) =>
          k.stripPrefix(ValuePrefix) -> bm },
        m.getOrElse(NullKey, new RoaringBitmap()))
    else // v1 sidecars: legacy unprefixed keys (pre-prefix writers)
      Decoded(m - NullKey, m.getOrElse(NullKey, new RoaringBitmap()))
  }

  /** Decide whether a file might contain rows matching `cond`. Exact
    * refutation for equality / IN / IS NULL / IS NOT NULL / != over
    * indexed columns; everything else conservatively matches. */
  def mightMatch(
      cond: Expression,
      indexedColumns: Set[String],
      load: String => Option[Decoded]): Boolean = {
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
        hasAny(a.name, a.dataType, Seq(r.eval()), load)
      case EqualTo(l, a: AttributeReference) if l.foldable && indexedColumns(a.name) =>
        hasAny(a.name, a.dataType, Seq(l.eval()), load)
      case In(a: AttributeReference, list)
          if list.forall(_.foldable) && indexedColumns(a.name) =>
        hasAny(a.name, a.dataType, list.map(_.eval()), load)
      case InSet(a: AttributeReference, values) if indexedColumns(a.name) =>
        hasAny(a.name, a.dataType, values.toSeq, load)
      case IsNull(a: AttributeReference) if indexedColumns(a.name) =>
        load(a.name).forall(_.nulls.getCardinality > 0)
      case IsNotNull(a: AttributeReference) if indexedColumns(a.name) =>
        load(a.name).forall(_.values.nonEmpty)
      case Not(EqualTo(a: AttributeReference, r))
          if r.foldable && indexedColumns(a.name) =>
        load(a.name).forall { d =>
          // refutable only when the file holds exactly this one value
          BloomIndex.canonical(r.eval(), a.dataType) match {
            case Some(s) => !(d.values.keySet == Set(s) && d.nulls.isEmpty)
            case None => true
          }
        }
      case _ => true
    }
  }

  private def hasAny(
      column: String, dt: org.apache.spark.sql.types.DataType, values: Seq[Any],
      load: String => Option[Decoded]): Boolean =
    load(column) match {
      case None => true
      case Some(d) =>
        values.exists(v => BloomIndex.canonical(v, dt) match {
          case None => true
          case Some(s) => d.values.contains(s)
        })
    }
}
