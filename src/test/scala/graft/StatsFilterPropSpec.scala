package graft

import graft.core.Meta.{ColStats, DataFileMeta, TableSchema}
import graft.core.StatsFilter
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized soundness sweep for monotonic-transform pruning: for
  * thousands of (file values, transform chain, comparison) draws,
  * `mightMatch == false` must imply NO row matches. Completeness
  * (pruning everything prunable) is not asserted — conservative keeps
  * are legal. Seeded: failures reproduce.
  */
class StatsFilterPropSpec extends AnyFunSuite {

  private val attr = AttributeReference("c", LongType, nullable = false)()
  private val sch = TableSchema.fromStruct(0L,
    StructType(Seq(StructField("c", LongType, nullable = false))),
    Seq.empty, Seq.empty, Map.empty)

  private def fileOf(vals: Seq[Long]): DataFileMeta =
    DataFileMeta("f.parquet", 1L, vals.size.toLong, 0L, 0L, 0,
      Map("c" -> ColStats(Some(vals.min.toString), Some(vals.max.toString), 0L)))

  /** one random monotone (either direction) chain over c, as both a
    * Catalyst expression and its Long-arithmetic ground truth */
  private def chain(rnd: scala.util.Random): (Expression, Long => Long) = {
    var expr: Expression = attr
    var f: Long => Long = identity
    (0 until rnd.nextInt(4)).foreach { _ =>
      val k = rnd.nextInt(2001) - 1000L
      rnd.nextInt(4) match {
        case 0 =>
          expr = Add(expr, Literal(k), EvalMode.ANSI)
          val g = f; f = v => g(v) + k
        case 1 =>
          expr = Subtract(Literal(k), expr, EvalMode.ANSI)
          val g = f; f = v => k - g(v)
        case 2 =>
          val m = rnd.nextInt(7) - 3L // small, may be negative or zero
          expr = Multiply(expr, Literal(m), EvalMode.ANSI)
          val g = f; f = v => g(v) * m
        case 3 =>
          expr = UnaryMinus(expr, failOnError = true)
          val g = f; f = v => -g(v)
      }
    }
    (expr, f)
  }

  test("monotone-chain pruning never drops a file containing a match") {
    val rnd = new scala.util.Random(20260813L)
    var pruned = 0
    (0 until 4000).foreach { trial =>
      val vals = Seq.fill(1 + rnd.nextInt(6))(rnd.nextInt(20001) - 10000L)
      val file = fileOf(vals)
      val (g, truth) = chain(rnd)
      // comparand near the transformed range so both outcomes occur
      val images = vals.map(truth)
      val rv = images(rnd.nextInt(images.size)) + rnd.nextInt(7) - 3L
      val (cmp, rowMatch): (Expression, Long => Boolean) = rnd.nextInt(5) match {
        case 0 => (EqualTo(g, Literal(rv)), v => truth(v) == rv)
        case 1 => (GreaterThan(g, Literal(rv)), v => truth(v) > rv)
        case 2 => (GreaterThanOrEqual(g, Literal(rv)), v => truth(v) >= rv)
        case 3 => (LessThan(g, Literal(rv)), v => truth(v) < rv)
        case 4 => (LessThanOrEqual(g, Literal(rv)), v => truth(v) <= rv)
      }
      val keep = StatsFilter.mightMatch(cmp, file, sch)
      if (!keep) pruned += 1
      assert(keep || !vals.exists(rowMatch),
        s"trial $trial WRONG PRUNE: vals=$vals cmp=$cmp")
    }
    // the sweep must actually exercise pruning, not just keep everything
    assert(pruned > 200, s"only $pruned of 4000 trials pruned — sweep too weak")
  }

  test("LEGACY-mode arithmetic is never trusted for pruning") {
    val file = fileOf(Seq(0L, 5L)) // c+10 spans [10, 15]
    val ansi = Add(attr, Literal(10L),
      NumericEvalContext(EvalMode.ANSI, true))
    val legacy = Add(attr, Literal(10L),
      NumericEvalContext(EvalMode.LEGACY, true))
    // ANSI: overflow throws at eval → monotone chain is trustworthy
    assert(!StatsFilter.mightMatch(EqualTo(ansi, Literal(100L)), file, sch))
    // LEGACY: overflow wraps silently → chain may not be monotone, so
    // the same provably-out-of-range predicate must NOT prune
    assert(StatsFilter.mightMatch(EqualTo(legacy, Literal(100L)), file, sch))
  }

  test("year()/trunc-style date transforms prune soundly") {
    val dAttr = AttributeReference("d", DateType, nullable = false)()
    val dSch = TableSchema.fromStruct(0L,
      StructType(Seq(StructField("d", DateType, nullable = false))),
      Seq.empty, Seq.empty, Map.empty)
    val rnd = new scala.util.Random(42L)
    var pruned = 0
    (0 until 2000).foreach { trial =>
      val days = Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(20000)) // 1970..2024
      val file = DataFileMeta("f.parquet", 1L, days.size.toLong, 0L, 0L, 0,
        Map("d" -> ColStats(Some(days.min.toString), Some(days.max.toString), 0L)))
      def yearOf(dd: Int): Int = java.time.LocalDate.ofEpochDay(dd.toLong).getYear
      val y = yearOf(days(rnd.nextInt(days.size))) + rnd.nextInt(3) - 1
      val (cmp, rowMatch): (Expression, Int => Boolean) = rnd.nextInt(3) match {
        case 0 => (EqualTo(Year(dAttr), Literal(y)), dd => yearOf(dd) == y)
        case 1 => (GreaterThanOrEqual(Year(dAttr), Literal(y)), dd => yearOf(dd) >= y)
        case 2 => (LessThan(Year(dAttr), Literal(y)), dd => yearOf(dd) < y)
      }
      val keep = StatsFilter.mightMatch(cmp, file, dSch)
      if (!keep) pruned += 1
      assert(keep || !days.exists(rowMatch),
        s"trial $trial WRONG PRUNE: days=$days y=$y cmp=$cmp")
    }
    assert(pruned > 100, s"only $pruned of 2000 trials pruned")
  }

  test("float/lossy-cast/legacy-negate/escape/utf8/unknown-null edges never wrong-prune") {
    // FLOAT equality compares AS floats: the stat string "0.1" is
    // Float.toString(0.1f); widening the probe to double first would
    // shift it off the re-parsed stat and refute a real match
    val fAttr = AttributeReference("f", FloatType, nullable = false)()
    val fSch = TableSchema.fromStruct(0L,
      StructType(Seq(StructField("f", FloatType, nullable = false))),
      Seq.empty, Seq.empty, Map.empty)
    val fFile = DataFileMeta("f.parquet", 1L, 1L, 0L, 0L, 0,
      Map("f" -> ColStats(Some("0.1"), Some("0.1"), 0L)))
    assert(StatsFilter.mightMatch(EqualTo(fAttr, Literal(0.1f)), fFile, fSch))
    // lossy widening CAST(float AS DOUBLE) > 0.1d: every row's cast
    // value is (double)0.1f = 0.10000000149... > 0.1d — a fast path
    // that re-parses the stat as double would see 0.1d and prune
    assert(StatsFilter.mightMatch(
      GreaterThan(Cast(fAttr, DoubleType), Literal(0.1d)), fFile, fSch))

    // LEGACY (failOnError=false) negation wraps at Long.MinValue —
    // never trusted for pruning; ANSI negation still prunes
    val wrapFile = DataFileMeta("f.parquet", 1L, 3L, 0L, 0L, 0,
      Map("c" -> ColStats(Some(Long.MinValue.toString), Some("20"), 0L)))
    assert(StatsFilter.mightMatch(
      EqualTo(UnaryMinus(attr, failOnError = false), Literal(-10L)), wrapFile, sch))
    val smallFile = fileOf(Seq(10L, 20L))
    assert(!StatsFilter.mightMatch(
      EqualTo(UnaryMinus(attr, failOnError = true), Literal(5L)), smallFile, sch))

    // LIKE under a CUSTOM escape char is opaque (its escape sequences
    // are not literal prefix bytes); the default escape still prunes
    val sAttr = AttributeReference("s", StringType, nullable = false)()
    val sSch = TableSchema.fromStruct(0L,
      StructType(Seq(StructField("s", StringType, nullable = false))),
      Seq.empty, Seq.empty, Map.empty)
    val sFile = DataFileMeta("f.parquet", 1L, 1L, 0L, 0L, 0,
      Map("s" -> ColStats(Some("abcdX"), Some("abcdX"), 0L)))
    assert(StatsFilter.mightMatch(Like(sAttr, Literal("abc!d%"), '!'), sFile, sSch))
    assert(!StatsFilter.mightMatch(Like(sAttr, Literal("zzz%"), '\\'), sFile, sSch))

    // string stats order is UTF-8 BYTES: U+10000 > U+E000 there, but
    // UTF-16 compareTo says the opposite and would prune an exact hit
    val u10000 = new String(Character.toChars(0x10000))
    val uFile = DataFileMeta("f.parquet", 1L, 2L, 0L, 0L, 0,
      Map("s" -> ColStats(Some("\uE000"), Some(u10000), 0L)))
    assert(StatsFilter.mightMatch(EqualTo(sAttr, Literal(u10000)), uFile, sSch))

    // IS NULL prunes only on a PROVEN zero null count; a negative
    // count means the writer recorded no null statistics
    val unkFile = DataFileMeta("f.parquet", 1L, 5L, 0L, 0L, 0,
      Map("c" -> ColStats(None, None, -1L)))
    assert(StatsFilter.mightMatch(IsNull(attr), unkFile, sch))
    assert(!StatsFilter.mightMatch(IsNull(attr), fileOf(Seq(1L, 2L)), sch))
  }

  test("StatsModes.truncateMin/Max: randomized bound soundness in UTF-8 byte order") {
    import graft.core.StatsModes
    def u8cmp(a: String, b: String): Int =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .binaryCompare(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    val rnd = new scala.util.Random(20260815L)
    // alphabet spanning ASCII, BMP boundaries, max-BMP, supplementary
    val alphabet: Array[Int] = Array(
      'a'.toInt, 'z'.toInt, '0'.toInt, 0x7F, 0x80, 0x7FF, 0x800,
      0xD7FF, 0xE000, 0xFFFD, 0xFFFF, 0x10000, 0x1F600, 0x10FFFF)
    def randString(): String = {
      val n = 1 + rnd.nextInt(8)
      val sb = new java.lang.StringBuilder
      (0 until n).foreach(_ => sb.appendCodePoint(alphabet(rnd.nextInt(alphabet.length))))
      sb.toString
    }
    (0 until 3000).foreach { _ =>
      val s0 = randString()
      val n = 1 + rnd.nextInt(6)
      val mn = StatsModes.truncateMin(s0, n)
      // lower bound: truncated min <= original
      assert(u8cmp(mn, s0) <= 0, s"min bound broke: '$mn' > '$s0'")
      StatsModes.truncateMax(s0, n).foreach { mx =>
        // upper bound: original <= truncated-rounded max
        assert(u8cmp(s0, mx) <= 0, s"max bound broke: '$s0' > '$mx'")
        // and EVERY string extending the n-point prefix stays under it
        val ext = StatsModes.truncateMin(s0, n) + randString()
        assert(u8cmp(ext, mx) < 0 || u8cmp(ext, s0) <= 0 ||
          s0.codePointCount(0, s0.length) <= n,
          s"prefix extension escaped the bound: '$ext' >= '$mx'")
      }
    }
  }
}
