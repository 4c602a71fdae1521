package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.roaringbitmap.RoaringBitmap
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Native Catalyst aggregate functions unioning serialized sketch
  * states (theta / roaring bitmaps). Unlike a UDAF over binary buffers
  * — which deserializes and reserializes the state on EVERY input row —
  * a TypedImperativeAggregate keeps the live object in the aggregation
  * buffer and serializes only at shuffle boundaries, which is what
  * makes sketch merge engines viable at 100 TB scale.
  *
  * Registered as SQL functions (graft_theta_union / graft_rbm32_union /
  * graft_rbm64_union) so the merge engine can reference them through
  * `expr(...)`.
  */
abstract class BinaryStateUnion[T]
    extends TypedImperativeAggregate[T] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY sketch column, got ${child.dataType.sql}")

  protected def unionBytes(buffer: T, bytes: Array[Byte]): T

  final override def update(buffer: T, input: InternalRow): T = {
    val v = child.eval(input)
    if (v == null) buffer
    else unionBytes(buffer, v.asInstanceOf[Array[Byte]])
  }
}

case class ThetaUnionSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BinaryStateUnion[Union] {

  override def prettyName: String = "graft_theta_union"
  override def createAggregationBuffer(): Union = SetOperation.builder().buildUnion()
  override protected def unionBytes(buffer: Union, bytes: Array[Byte]): Union = {
    buffer.union(Memory.wrap(bytes)); buffer
  }
  override def merge(buffer: Union, input: Union): Union = {
    buffer.union(input.getResult); buffer
  }
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(storage: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(storage))
    u
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionSketch =
    copy(child = newChild)
}

case class Rbm32Union(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BinaryStateUnion[RoaringBitmap] {

  override def prettyName: String = "graft_rbm32_union"
  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap()
  override protected def unionBytes(buffer: RoaringBitmap, bytes: Array[Byte]): RoaringBitmap = {
    buffer.or(Sketches.deserializeRbm32(bytes)); buffer
  }
  override def merge(buffer: RoaringBitmap, input: RoaringBitmap): RoaringBitmap = {
    buffer.or(input); buffer
  }
  override def eval(buffer: RoaringBitmap): Any = Sketches.serializeRbm32(buffer)
  override def serialize(buffer: RoaringBitmap): Array[Byte] = Sketches.serializeRbm32(buffer)
  override def deserialize(storage: Array[Byte]): RoaringBitmap =
    Sketches.deserializeRbm32(storage)
  override def withNewMutableAggBufferOffset(newOffset: Int): Rbm32Union =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Rbm32Union =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Rbm32Union =
    copy(child = newChild)
}

case class Rbm64Union(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BinaryStateUnion[Roaring64Bitmap] {

  override def prettyName: String = "graft_rbm64_union"
  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()
  override protected def unionBytes(buffer: Roaring64Bitmap, bytes: Array[Byte]): Roaring64Bitmap = {
    buffer.or(Sketches.deserializeRbm64(bytes)); buffer
  }
  override def merge(buffer: Roaring64Bitmap, input: Roaring64Bitmap): Roaring64Bitmap = {
    buffer.or(input); buffer
  }
  override def eval(buffer: Roaring64Bitmap): Any = Sketches.serializeRbm64(buffer)
  override def serialize(buffer: Roaring64Bitmap): Array[Byte] = Sketches.serializeRbm64(buffer)
  override def deserialize(storage: Array[Byte]): Roaring64Bitmap =
    Sketches.deserializeRbm64(storage)
  override def withNewMutableAggBufferOffset(newOffset: Int): Rbm64Union =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Rbm64Union =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Rbm64Union =
    copy(child = newChild)
}

object SketchAggregates {
  /** Idempotently register the union aggregates with a session. */
  // register once per session: createOrReplaceTempFunction re-issues a
  // "function replaced" warning on every call site otherwise
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = {
    if (!registered.add(spark)) return
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_theta_union",
      es => ThetaUnionSketch(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_rbm32_union",
      es => Rbm32Union(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_rbm64_union",
      es => Rbm64Union(es.head), "built-in")
  }
}
