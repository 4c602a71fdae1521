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
  private val MaxRank = (1 << Bits) - 1

  private def isRangeScalable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType => true
    case _ => false
  }

  /** Numeric view of a rankable column. DATE and TIMESTAMP_NTZ have no
    * double cast in Spark (a bare `.cast("double")` is an
    * AnalysisException) — they route through their internal numerics. */
  private def asDouble(c: Column, dt: DataType): Column = dt match {
    case DateType => unix_date(c).cast("double")
    case TimestampNTZType => c.cast(TimestampType).cast("double")
    case _ => c.cast("double")
  }

  /** Map a column to an order-preserving Bits-bit rank. Numeric/
    * temporal columns scale their ACTUAL [min,max] range onto the full
    * rank space (a static bit-truncation would collapse small-domain
    * keys onto one rank and cluster nothing); strings use a two-byte
    * prefix. Nulls rank 0; NaN ranks MaxRank (Spark sorts NaN greatest)
    * and infinities clamp — one stray special value must not poison the
    * whole dimension or throw in the ANSI double→long cast. */
  private def rank(c: Column, dt: DataType, bounds: Option[(Double, Double)]): Column =
    dt match {
      case _ if isRangeScalable(dt) =>
        val (mn, mx) = bounds.getOrElse((0.0, 0.0))
        if (mx <= mn) lit(0L)
        else {
          val d = asDouble(c, dt)
          val scaled = (d - lit(mn)) * lit(MaxRank.toDouble / (mx - mn))
          coalesce(
            least(greatest(nanvl(scaled, lit(MaxRank.toDouble)), lit(0.0)),
              lit(MaxRank.toDouble)).cast("long"),
            lit(0L))
        }
      case StringType =>
        // first two CHARS, clamped to one byte each: ascii() yields the
        // full Unicode codepoint, and an unclamped CJK/Cyrillic char
        // would overflow the 16-bit rank into meaningless low bits
        val b1 = least(coalesce(ascii(substring(c, 1, 1)), lit(0)), lit(255))
        val b2 = least(coalesce(ascii(substring(c, 2, 1)), lit(0)), lit(255))
        (b1 * 256 + b2).cast("long")
      case BooleanType => coalesce(c.cast("long") * MaxRank, lit(0L))
      case _ => lit(0L)
    }

  /** Interleave the bits of up to 4 rank values into one z-value.
    * Triggers one min/max aggregation over `df` to learn the value
    * ranges (this runs inside a compaction job; one extra stats pass
    * over data about to be rewritten is the standard price of
    * range-aware z-ordering). */
  /** Per-dimension bits that keep the interleave OUT of the sign bit:
    * 16×4 = 64 would put the top bit at position 63, flipping half the
    * z-space negative — signed range partitioning then co-locates the
    * all-max and all-min corners in one wraparound file whose stats
    * never prune. The LOWEST rank bits are dropped (coarse order kept). */
  private def effBits(n: Int): Int = math.min(Bits, 63 / n)

  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= 4, "z-order supports 1..4 columns")
    val ranks = rankColumns(df, cols)
    val n = ranks.size
    val bits = effBits(n)
    val parts = for {
      bit <- 0 until bits
      (r, d) <- ranks.zipWithIndex
    } yield {
      val srcBit = shiftright(r, bit + (Bits - bits)).bitwiseAND(1L)
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

  // ---- Hilbert clustering ---------------------------------------------

  /** Hilbert index of one point given per-dimension `Bits`-bit ranks —
    * Skilling's transpose algorithm ("Programming the Hilbert curve",
    * AIP Conf. Proc. 707, 2004; the same construction behind the
    * reference's HilbertIndexer, paimon-common .../sort/hilbert/
    * HilbertIndexer.java:65). Hilbert degrades slower than z-order as
    * dimensionality grows: consecutive index values are always grid
    * neighbors, so range partitions cut fewer dimension boundaries. */
  private[graft] def hilbertIndex(ranks: Array[Long], bits: Int = Bits): Long = {
    val n = ranks.length
    val x = ranks.clone()
    // inverse undo of the Gray-code transform
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transposed coords MSB-first into one index
    var idx = 0L
    var b = bits - 1
    while (b >= 0) {
      var d = 0
      while (d < n) { idx = (idx << 1) | ((x(d) >> b) & 1L); d += 1 }
      b -= 1
    }
    idx
  }

  /** Hilbert-curve clustering (order_strategy=hilbert). Rank scaling is
    * the same codegen'd range mapping as z-order; the per-row index is
    * a compiled loop kernel (a UDF, mirroring the reference's
    * SparkHilbertUDF — the bit loops have no expression form). */
  def clusterByHilbert(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    require(cols.nonEmpty && cols.size <= 4, "hilbert supports 1..4 columns")
    val ranks = rankColumns(df, cols)
    val bits = effBits(cols.size) // keep the index out of the sign bit
    val drop = Bits - bits
    val hUdf = udf((rs: Seq[Long]) =>
      hilbertIndex(rs.map(_ >> drop).toArray, bits))
    df.withColumn("__h", hUdf(array(ranks: _*)))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }

  /** Range-scaled Bits-bit rank per clustering column (shared by
    * z-order and hilbert). One min/max pass over `df`. */
  private def rankColumns(df: DataFrame, cols: Seq[String]): Seq[Column] = {
    val scalable = cols.filter(c => isRangeScalable(df.schema(c).dataType))
    // NaN/∞ excluded from the bounds: one NaN would otherwise make the
    // driver-side multiplier NaN and clamp EVERY row onto one rank
    def finite(c: String): Column = {
      val d = asDouble(col(c), df.schema(c).dataType)
      when(!isnan(d) && d > Double.NegativeInfinity &&
        d < Double.PositiveInfinity, d)
    }
    val boundsRow =
      if (scalable.isEmpty) None
      else Some(df.agg(lit(0).as("__z0"), scalable.flatMap(c => Seq(
        min(finite(c)).as(s"mn_$c"),
        max(finite(c)).as(s"mx_$c"))): _*).head())
    val bounds: Map[String, (Double, Double)] = scalable.flatMap { c =>
      boundsRow.flatMap { r =>
        val mn = r.getAs[Any](s"mn_$c")
        val mx = r.getAs[Any](s"mx_$c")
        if (mn == null || mx == null) None
        else Some(c -> (mn.asInstanceOf[Double], mx.asInstanceOf[Double]))
      }
    }.toMap
    cols.map(c => rank(col(c), df.schema(c).dataType, bounds.get(c)))
  }
}
