package graft.core

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.roaringbitmap.RoaringBitmap
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Deletion vectors: per-file RoaringBitmaps of deleted row positions
  * (reference: paimon-common .../deletionvectors/BitmapDeletionVector
  * .java + BucketedDvMaintainer). DELETE/UPDATE mark positions instead
  * of rewriting files; scans subtract the bitmap.
  *
  * Bitmaps are built distributed — rows matching the predicate are
  * grouped by `_metadata.file_path` and their `_metadata.row_index`
  * values folded into a RoaringBitmap with map-side partial merge, so
  * only the (small) serialized bitmaps reach the driver.
  */
object DeletionVectors {

  val OptionEnabled = "deletion-vectors.enabled"

  final class BitmapAgg extends Aggregator[Long, RoaringBitmap, Array[Byte]] {
    override def zero: RoaringBitmap = new RoaringBitmap()
    override def reduce(b: RoaringBitmap, rowIndex: Long): RoaringBitmap = {
      require(rowIndex <= Int.MaxValue, "row index exceeds 32-bit deletion vector")
      b.add(rowIndex.toInt)
      b
    }
    override def merge(b1: RoaringBitmap, b2: RoaringBitmap): RoaringBitmap =
      { b1.or(b2); b1 }
    override def finish(r: RoaringBitmap): Array[Byte] = serialize(r)
    override def bufferEncoder: Encoder[RoaringBitmap] =
      Encoders.javaSerialization(classOf[RoaringBitmap])
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def serialize(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val out = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(out))
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val bm = deserialize(a)
    bm.or(deserialize(b))
    serialize(bm)
  }

  /** Positions in `a` but not in `b` (the rows a grown deletion vector
    * newly deleted). */
  def diff(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val bm = deserialize(a)
    bm.andNot(deserialize(b))
    serialize(bm)
  }

  def cardinality(bytes: Array[Byte]): Long =
    deserialize(bytes).getLongCardinality
}
