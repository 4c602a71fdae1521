package graft

import graft.core.RangeIndex
import graft.table.GraftTable
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Randomized soundness sweep for the range-bitmap file index through
  * the public planning API: random string + numeric values with
  * overlapping per-file ranges, hundreds of random
  * eq/IN/range/null/not-equal/cross-column predicates; planEntries
  * must keep every file containing a matching row (brute force
  * cross-check) and scans must return exactly the brute-force rows.
  * Seeded. */
class RangeIndexPropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("d", DoubleType, nullable = true)))

  test("random predicates over string+double range indexes never lose rows") {
    val rnd = new scala.util.Random(991L)
    val path = Files.createTempDirectory("graft-rangeprop").toString + "/t"
    val t = GraftTable.create(spark, path, sch,
      options = Map(RangeIndex.OptionColumns -> "s,d"))
    val words = Vector("ant", "bee", "cat", "dog", "eel", "fly", "gnu",
      "hen", "ibis", "jay", null)
    def word(): String = words(rnd.nextInt(words.size))
    def dbl(): java.lang.Double =
      if (rnd.nextInt(8) == 0) null
      else java.lang.Double.valueOf((rnd.nextInt(400) - 200) / 4.0)
    var k = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, java.lang.Double)]
    (0 until 12).foreach { _ =>
      val batch = Seq.fill(8) { k += 1; (k, word(), dbl()) }
      rows ++= batch
      t.write(spark.createDataFrame(
        batch.map(r => Row(r._1, r._2, r._3)).asJava, sch).coalesce(1))
    }
    def matches(pred: (String, java.lang.Double) => Boolean): Set[Long] =
      rows.iterator.filter(r => pred(r._2, r._3)).map(_._1).toSet
    val nonNull = words.filter(_ != null)
    for (trial <- 0 until 200) {
      val (cond, oracle): (Column, Set[Long]) = rnd.nextInt(7) match {
        case 0 =>
          val w = nonNull(rnd.nextInt(nonNull.size))
          (col("s") === w, matches((s, _) => s == w))
        case 1 =>
          val ws = Seq.fill(1 + rnd.nextInt(3))(nonNull(rnd.nextInt(nonNull.size)))
          (col("s").isin(ws: _*), matches((s, _) => s != null && ws.contains(s)))
        case 2 =>
          val (a, b) = (nonNull(rnd.nextInt(nonNull.size)),
            nonNull(rnd.nextInt(nonNull.size)))
          val (lo, hi) = if (a <= b) (a, b) else (b, a)
          (col("s") >= lo && col("s") < hi,
            matches((s, _) => s != null && s >= lo && s < hi))
        case 3 =>
          val v = (rnd.nextInt(400) - 200) / 4.0
          (col("d") > v, matches((_, d) => d != null && d > v))
        case 4 =>
          val (a, b) = ((rnd.nextInt(400) - 200) / 4.0, (rnd.nextInt(400) - 200) / 4.0)
          val (lo, hi) = (math.min(a, b), math.max(a, b))
          (col("d") >= lo && col("d") <= hi,
            matches((_, d) => d != null && d >= lo && d <= hi))
        case 5 =>
          (col("s").isNull && col("d").isNotNull,
            matches((s, d) => s == null && d != null))
        case 6 =>
          // cross-column conjunct: both range-indexed, positions intersect
          val w = nonNull(rnd.nextInt(nonNull.size))
          val v = (rnd.nextInt(400) - 200) / 4.0
          (col("s") === w && col("d") <= v,
            matches((s, d) => s == w && d != null && d <= v))
      }
      // the scan reads only planEntries' survivors, so row equality IS
      // the no-wrong-prune check (a pruned file would lose its rows)
      val got = t.scan(cond).collect().map(_.getLong(0)).toSet
      assert(got == oracle, s"trial $trial diverged for $cond: " +
        s"missing=${oracle -- got} extra=${got -- oracle}")
    }
  }
}
