package graft.core

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.roaringbitmap.RoaringBitmap
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Per-file bit-sliced index (BSI) sidecars for numeric columns
  * (reference: paimon-common .../fileindex/bsi/
  * BitSliceIndexBitmapFileIndex.java:56, RangeBitmapFileIndex.java:43).
  *
  * For an indexed integral column the sidecar stores, per bit of the
  * sign-flipped 64-bit value, a RoaringBitmap of the row positions
  * having that bit set (plus an existence bitmap for non-null rows).
  * This answers "does any row hold a value in [lo, hi]?" EXACTLY in
  * O(64) bitmap operations — refuting range predicates that fall into
  * gaps INSIDE a file's min/max span, which min/max stats cannot
  * (bloom = equality-approx, bitmap = equality-exact-but-capped; BSI
  * has no cardinality cap because the slice count is fixed at 64).
  *
  * Build: same distributed shape as the bloom/bitmap indexes — one
  * commit-time job folding (value, row_index) into the slices with
  * map-side partial merge; executors write sidecars, only paths
  * return. Evaluation happens driver-side during manifest pruning on
  * the (cached) decoded sidecar.
  */
object BsiIndex {

  val OptionColumns = "file-index.bsi.columns"

  /** order-preserving unsigned mapping of a signed long */
  @inline private def flip(v: Long): Long = v ^ Long.MinValue

  /** Mutable build state: 64 bit-slices + existence + signed min/max. */
  final class Buf extends Serializable {
    val slices: Array[RoaringBitmap] = Array.fill(64)(new RoaringBitmap())
    val existence: RoaringBitmap = new RoaringBitmap()
    var min: Long = Long.MaxValue
    var max: Long = Long.MinValue
  }

  /** (value or null, rowIndex) → bit-sliced position bitmaps. */
  final class BsiAgg extends Aggregator[(java.lang.Long, Long), Buf, Array[Byte]] {
    override def zero: Buf = new Buf
    override def reduce(b: Buf, in: (java.lang.Long, Long)): Buf = {
      if (in._1 != null) {
        val v = in._1.longValue()
        require(in._2 <= Int.MaxValue, "row index exceeds 32-bit bitmap")
        val idx = in._2.toInt
        b.existence.add(idx)
        if (v < b.min) b.min = v
        if (v > b.max) b.max = v
        val u = flip(v)
        var bit = 0
        while (bit < 64) {
          if ((u & (1L << bit)) != 0) b.slices(bit).add(idx)
          bit += 1
        }
      }
      b
    }
    override def merge(b1: Buf, b2: Buf): Buf = {
      b1.existence.or(b2.existence)
      var bit = 0
      while (bit < 64) { b1.slices(bit).or(b2.slices(bit)); bit += 1 }
      b1.min = math.min(b1.min, b2.min)
      b1.max = math.max(b1.max, b2.max)
      b1
    }
    override def finish(r: Buf): Array[Byte] = serialize(r)
    override def bufferEncoder: Encoder[Buf] =
      Encoders.javaSerialization(classOf[Buf])
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.min)
    out.writeLong(b.max)
    def writeBm(bm: RoaringBitmap): Unit = {
      bm.runOptimize()
      val bb = new ByteArrayOutputStream()
      bm.serialize(new DataOutputStream(bb))
      val bytes = bb.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    writeBm(b.existence)
    out.writeInt(64)
    b.slices.foreach(writeBm)
    bos.toByteArray
  }

  final case class Decoded(
      min: Long, max: Long,
      existence: RoaringBitmap, slices: Array[RoaringBitmap]) {

    /** rows with sign-flipped value <= u (unsigned), classic BSI
      * compare: walk slices MSB→LSB keeping an equal-so-far set. */
    private def le(u: Long): RoaringBitmap = {
      var eq = existence.clone()
      val lt = new RoaringBitmap()
      var bit = 63
      while (bit >= 0 && !eq.isEmpty) {
        if ((u & (1L << bit)) != 0) {
          lt.or(RoaringBitmap.andNot(eq, slices(bit)))
          eq.and(slices(bit))
        } else {
          eq = RoaringBitmap.andNot(eq, slices(bit))
        }
        bit -= 1
      }
      lt.or(eq)
      lt
    }

    /** Does any non-null row hold a value in signed [lo, hi]? Exact. */
    def existsInRange(lo: Long, hi: Long): Boolean = {
      if (existence.isEmpty || hi < lo || hi < min || lo > max) return false
      if (lo <= min && max <= hi) return true
      val leHi = le(flip(hi))
      val inRange =
        if (lo == Long.MinValue) leHi
        else RoaringBitmap.andNot(leHi, le(flip(lo - 1)))
      !inRange.isEmpty
    }
  }

  def deserialize(bytes: Array[Byte]): Decoded = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val min = in.readLong()
    val max = in.readLong()
    def readBm(): RoaringBitmap = {
      val len = in.readInt()
      val bb = new Array[Byte](len)
      in.readFully(bb)
      val bm = new RoaringBitmap()
      bm.deserialize(new DataInputStream(new ByteArrayInputStream(bb)))
      bm
    }
    val existence = readBm()
    val n = in.readInt()
    Decoded(min, max, existence, Array.fill(n)(readBm()))
  }

  private def toLong(v: Any): Option[Long] = v match {
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case _ => None // non-integral literal: no refutation
  }

  /** Decide whether a file might contain rows matching `cond`.
    *
    * Range conjuncts over the same indexed column are INTERSECTED
    * before testing (`x > 10 AND x < 20` probes the single range
    * (10, 20) — refutable even when values exist on both sides), which
    * is exactly the case min/max stats cannot refute. Equality / IN
    * probe point ranges. Anything else conservatively matches. */
  def mightMatch(
      cond: Expression,
      indexedColumns: Set[String],
      load: String => Option[Decoded]): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val cs = conjuncts(cond)
    // per-column intersected [lo, hi] from range/equality conjuncts
    val ranges = scala.collection.mutable.Map.empty[String, (Long, Long)]
    var refuted = false
    def narrow(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = ranges.getOrElse(c, (Long.MinValue, Long.MaxValue))
      ranges(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    cs.foreach {
      case GreaterThan(a: AttributeReference, r) if r.foldable && indexedColumns(a.name) =>
        toLong(r.eval()).foreach(v =>
          if (v == Long.MaxValue) refuted = true else narrow(a.name, v + 1, Long.MaxValue))
      case GreaterThan(l, a: AttributeReference) if l.foldable && indexedColumns(a.name) =>
        toLong(l.eval()).foreach(v =>
          if (v == Long.MinValue) refuted = true else narrow(a.name, Long.MinValue, v - 1))
      case GreaterThanOrEqual(a: AttributeReference, r) if r.foldable && indexedColumns(a.name) =>
        toLong(r.eval()).foreach(v => narrow(a.name, v, Long.MaxValue))
      case GreaterThanOrEqual(l, a: AttributeReference) if l.foldable && indexedColumns(a.name) =>
        toLong(l.eval()).foreach(v => narrow(a.name, Long.MinValue, v))
      case LessThan(a: AttributeReference, r) if r.foldable && indexedColumns(a.name) =>
        toLong(r.eval()).foreach(v =>
          if (v == Long.MinValue) refuted = true else narrow(a.name, Long.MinValue, v - 1))
      case LessThan(l, a: AttributeReference) if l.foldable && indexedColumns(a.name) =>
        toLong(l.eval()).foreach(v =>
          if (v == Long.MaxValue) refuted = true else narrow(a.name, v + 1, Long.MaxValue))
      case LessThanOrEqual(a: AttributeReference, r) if r.foldable && indexedColumns(a.name) =>
        toLong(r.eval()).foreach(v => narrow(a.name, Long.MinValue, v))
      case LessThanOrEqual(l, a: AttributeReference) if l.foldable && indexedColumns(a.name) =>
        toLong(l.eval()).foreach(v => narrow(a.name, v, Long.MaxValue))
      case EqualTo(a: AttributeReference, r) if r.foldable && indexedColumns(a.name) =>
        toLong(r.eval()).foreach(v => narrow(a.name, v, v))
      case EqualTo(l, a: AttributeReference) if l.foldable && indexedColumns(a.name) =>
        toLong(l.eval()).foreach(v => narrow(a.name, v, v))
      case In(a: AttributeReference, list)
          if list.forall(_.foldable) && indexedColumns(a.name) =>
        val vs = list.map(e => toLong(e.eval()))
        if (vs.forall(_.isDefined))
          refuted ||= !load(a.name).forall(d =>
            vs.flatten.exists(v => d.existsInRange(v, v)))
      case InSet(a: AttributeReference, values) if indexedColumns(a.name) =>
        val vs = values.toSeq.map(toLong)
        if (vs.forall(_.isDefined))
          refuted ||= !load(a.name).forall(d =>
            vs.flatten.exists(v => d.existsInRange(v, v)))
      // a disjunction refutes only when EVERY branch does (branches
      // may be conjunctions — recurse through the full evaluator)
      case Or(l, r) =>
        refuted ||= !(mightMatch(l, indexedColumns, load) ||
          mightMatch(r, indexedColumns, load))
      case _ => // not BSI-evaluable: no contribution
    }
    if (refuted) return false
    ranges.forall { case (c, (lo, hi)) =>
      if (lo > hi) false
      else load(c).forall(_.existsInRange(lo, hi))
    }
  }
}
