package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering for sort-compaction.
  *
  * Re-expresses the reference's z-order sort-compact
  * (paimon-common .../sort/zorder/ZIndexer.java + paimon-spark
  * .../sort/TableSorter.java:30-82) Spark-first: each column is mapped
  * to an unsigned 16-bit rank, the ranks are bit-interleaved into one
  * long z-value with codegen'd bit expressions, and the data is
  * `repartitionByRange(zvalue).sortWithinPartitions(zvalue)` — range
  * partitioning gives globally clustered files whose per-file min/max
  * stats become tight on *all* participating dimensions, which is what
  * makes multi-column scans prune.
  */
object ZOrder {

  private val Bits = 16 // bits kept per dimension (up to 4 dims in a long)

  /** Map a column to an unsigned Bits-bit value preserving order.
    * Numeric types: scale into [0, 2^16) by flipping the sign bit of a
    * normalized long (order-preserving for negatives); strings: first
    * two bytes. Nulls sort first (rank 0). */
  private def rank(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType =>
      // flip sign bit → unsigned order, then keep top 16 of 64 bits
      val unsigned = c.cast("long").bitwiseXOR(lit(Long.MinValue))
      shiftrightunsigned(unsigned, 64 - Bits)
    case FloatType | DoubleType =>
      // monotone coarsening: clamp to a safe range, truncate to long
      // (ANSI-safe), then unsigned-order via sign-bit flip
      val clamped = least(greatest(c.cast("double"), lit(-9e15)), lit(9e15))
      val unsigned = clamped.cast("long").bitwiseXOR(lit(Long.MinValue))
      shiftrightunsigned(unsigned, 64 - Bits)
    case TimestampType | TimestampNTZType =>
      val unsigned = c.cast("long").bitwiseXOR(lit(Long.MinValue))
      shiftrightunsigned(unsigned, 64 - Bits)
    case StringType =>
      // first two bytes, big-endian
      val b = substring(c, 1, 2)
      val b1 = coalesce(ascii(substring(b, 1, 1)), lit(0))
      val b2 = coalesce(ascii(substring(b, 2, 1)), lit(0))
      (b1 * 256 + b2).cast("long")
    case BooleanType => c.cast("long") * lit((1 << Bits) - 1)
    case _ => lit(0L)
  }

  /** Interleave the bits of up to 4 rank values into one z-value. */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= 4, "z-order supports 1..4 columns")
    val ranks = cols.map(c => rank(col(c), df.schema(c).dataType))
    val n = ranks.size
    val parts = for {
      bit <- 0 until Bits
      (r, d) <- ranks.zipWithIndex
    } yield {
      val srcBit = shiftright(r, bit).bitwiseAND(1L)
      shiftleft(srcBit, bit * n + d)
    }
    coalesce(parts.reduce((a, b) => a.bitwiseOR(b)), lit(0L))
  }

  /** Cluster a DataFrame by z-value across `numFiles` range partitions,
    * sorted within each — the physical layout step of sort-compact. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    val z = zvalue(df, cols)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Plain lexicographic order clustering (order_strategy=order). */
  def clusterByOrder(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
}
