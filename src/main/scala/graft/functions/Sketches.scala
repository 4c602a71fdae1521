package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches => ThetaSketches, UpdateSketch, Union}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.roaringbitmap.RoaringBitmap
import org.roaringbitmap.longlong.Roaring64Bitmap
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Sketch column functions backing the aggregation merge engine's
  * `theta_sketch` / `hll_sketch` / `rbm32` / `rbm64` field aggregates
  * (reference: paimon-core .../aggregate/FieldThetaSketchAgg.java,
  * FieldHllSketchAgg.java, FieldRoaringBitmap32Agg.java,
  * FieldRoaringBitmap64Agg.java).
  *
  * Model (same as the reference): the stored field value IS the
  * serialized sketch; writers insert singleton sketches built from raw
  * values, and the merge engine unions the binary states — which makes
  * the aggregate fully mergeable across commits, compactions and
  * shuffles. HLL uses Spark's built-in hll_sketch_agg/hll_union_agg
  * (DataSketches-compatible); theta and roaring bitmaps union through
  * Aggregators over the serialized form.
  */
object Sketches {

  // ---- singleton builders (ingestion side) ---------------------------

  /** Per-thread reusable sketch for singleton building (allocating an
    * UpdateSketch per row dominates ingestion cost otherwise). */
  private object ThetaLocal extends Serializable {
    @transient lazy val sketch: ThreadLocal[UpdateSketch] =
      ThreadLocal.withInitial(() => UpdateSketch.builder().build())
  }

  /** Singleton theta sketch of a long value. */
  val thetaSingletonUdf: Column => Column = {
    val f = udf { (v: java.lang.Long) =>
      if (v == null) null
      else {
        val s = ThetaLocal.sketch.get()
        s.reset()
        s.update(v.longValue())
        s.compact().toByteArray
      }
    }
    c => f(c)
  }

  /** Singleton 32-bit roaring bitmap of an int value. */
  val rbm32SingletonUdf: Column => Column = {
    val f = udf { (v: java.lang.Integer) =>
      if (v == null) null
      else serializeRbm32(RoaringBitmap.bitmapOf(v.intValue()))
    }
    c => f(c)
  }

  /** Singleton 64-bit roaring bitmap of a long value. */
  val rbm64SingletonUdf: Column => Column = {
    val f = udf { (v: java.lang.Long) =>
      if (v == null) null
      else {
        val bm = new Roaring64Bitmap()
        bm.addLong(v.longValue())
        serializeRbm64(bm)
      }
    }
    c => f(c)
  }

  // ---- estimators (read side) ----------------------------------------

  val thetaEstimateUdf: Column => Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) 0L
      else math.round(ThetaSketches.wrapCompactSketch(Memory.wrap(b)).getEstimate)
    }
    c => f(c)
  }

  val rbm32CardinalityUdf: Column => Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) 0L else deserializeRbm32(b).getLongCardinality
    }
    c => f(c)
  }

  val rbm64CardinalityUdf: Column => Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) 0L else deserializeRbm64(b).getLongCardinality
    }
    c => f(c)
  }

  // ---- union aggregators (merge engine side) -------------------------

  /** Union of serialized binary states via a pluggable combiner. */
  final class BinaryUnionAgg(combine: (Array[Byte], Array[Byte]) => Array[Byte])
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] with Serializable {
    override def zero: Array[Byte] = null
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
      if (a == null) b else if (b == null) a else combine(b, a)
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = reduce(b1, b2)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  val thetaUnion: (Array[Byte], Array[Byte]) => Array[Byte] = (a, b) => {
    val u: Union = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(a))
    u.union(Memory.wrap(b))
    u.getResult.toByteArray
  }

  val rbm32Union: (Array[Byte], Array[Byte]) => Array[Byte] = (a, b) => {
    val bm = deserializeRbm32(a)
    bm.or(deserializeRbm32(b))
    serializeRbm32(bm)
  }

  val rbm64Union: (Array[Byte], Array[Byte]) => Array[Byte] = (a, b) => {
    val bm = deserializeRbm64(a)
    bm.or(deserializeRbm64(b))
    serializeRbm64(bm)
  }

  // ---- serialization -------------------------------------------------

  def serializeRbm32(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val out = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(out))
    out.toByteArray
  }

  def deserializeRbm32(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  def serializeRbm64(bm: Roaring64Bitmap): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(out))
    out.toByteArray
  }

  def deserializeRbm64(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }
}
