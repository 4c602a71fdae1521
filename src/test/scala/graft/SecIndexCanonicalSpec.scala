package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, EvalMode, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The secondary index's widen-stability invariant: a numeric value
  * stored under its original type and the same logical value probed
  * under ANY legal widened type must canonicalize to the SAME string
  * (build side: `(cast double + 0.0) cast string` executed by Spark;
  * probe side: the eval'd Cast(Add(Cast(...))) chain). A disagreement
  * is a wrong-prune. Covers -0.0/0.0, NaN, infinities, and >2^53
  * longs (where double rounding must at least be CONSISTENT). */
class SecIndexCanonicalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** build-side canonical string, via the same Column expression the
    * index writer uses, executed by Spark */
  private def buildSide(v: Any, dt: DataType): Option[String] = {
    val sch = StructType(Seq(StructField("c", dt, nullable = true)))
    val df = spark.createDataFrame(Seq(Row(v)).asJava, sch)
    Option(df.select((col("c").cast("double") + lit(0.0)).cast("string"))
      .head.getString(0))
  }

  /** probe-side canonical string (mirror of GraftTable.secIndexPrune) */
  private def probeSide(v: Any, dt: DataType): Option[String] = {
    val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
    val l = Literal.create(v, dt)
    Option(Cast(Add(Cast(l, DoubleType, tz), Literal(0.0d), EvalMode.ANSI),
      StringType, tz).eval(null)).map(_.toString)
  }

  test("stored value and widened probe literal canonicalize identically") {
    // (stored value, stored type, probe value, probe type) — probe is
    // the same logical value after a legal widen
    val cases: Seq[(Any, DataType, Any, DataType)] = Seq(
      (5, IntegerType, 5L, LongType),
      (5, IntegerType, 5.0d, DoubleType),
      (-7, IntegerType, -7.0d, DoubleType),
      (5.toShort, ShortType, 5, IntegerType),
      (1.5f, FloatType, 1.5d, DoubleType),
      (123456789L, LongType, 1.23456789e8, DoubleType),
      // beyond 2^53: rounding must agree between the two paths
      (9007199254740993L, LongType, 9007199254740993L, LongType),
      (new java.math.BigDecimal("5.00"), DecimalType(10, 2), 5.0d, DoubleType),
      (new java.math.BigDecimal("0.10"), DecimalType(10, 2), 0.1d, DoubleType),
      (-0.0d, DoubleType, 0.0d, DoubleType), // Spark compares them equal
      (-0.0f, FloatType, 0.0d, DoubleType),
      (Double.NaN, DoubleType, Double.NaN, DoubleType),
      (Double.PositiveInfinity, DoubleType, Double.PositiveInfinity, DoubleType),
      (Double.NegativeInfinity, DoubleType, Double.NegativeInfinity, DoubleType))
    cases.foreach { case (sv, st, pv, pt) =>
      val b = buildSide(sv, st)
      val p = probeSide(pv, pt)
      assert(b == p, s"stored $sv:$st -> $b, probed $pv:$pt -> $p")
      assert(b.isDefined, s"canonical of $sv:$st must not be null")
    }
  }

  test("randomized widen agreement: int/long/float stored vs double probe") {
    val rnd = new scala.util.Random(99L)
    (0 until 300).foreach { _ =>
      val i = rnd.nextInt()
      assert(buildSide(i, IntegerType) == probeSide(i.toDouble, DoubleType), s"int $i")
      val f = java.lang.Float.intBitsToFloat(rnd.nextInt())
      if (!f.isNaN) // NaN bit patterns all canonicalize to "NaN" anyway
        assert(buildSide(f, FloatType) == probeSide(f.toDouble, DoubleType), s"float $f")
      val l = rnd.nextLong() >> rnd.nextInt(12) // mix magnitudes
      assert(buildSide(l, LongType) == probeSide(l, LongType), s"long $l")
    }
  }
}
