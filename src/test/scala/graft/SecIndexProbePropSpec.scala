package graft

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Randomized soundness sweep for secondary-index probes through the
  * public planning API: one table, hundreds of random =/IN/range
  * predicates; planEntries must keep every file that contains a
  * matching row (checked against driver-side brute force) and the
  * scan row count must equal the brute-force count. Seeded. */
class SecIndexProbePropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("n", LongType, nullable = true)))

  test("random =/IN/range probes never lose a matching file or row") {
    val rnd = new scala.util.Random(613L)
    val path = Files.createTempDirectory("graft-secprop").toString + "/t"
    val t = GraftTable.create(spark, path, sch,
      options = Map(GraftTable.SecIndexColumns -> "n",
        "secondary-index.compact-trigger" -> "6"))
    // 15 files of 8 rows with heavily overlapping ranges + some nulls
    var k = 0L
    val fileVals = (0 until 15).map { _ =>
      val vals = Seq.fill(8)(
        if (rnd.nextInt(10) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(200).toLong))
      t.write(spark.createDataFrame(
        vals.map { v => k += 1; Row(k, v) }.asJava, sch).coalesce(1))
      vals.flatMap(Option(_)).map(_.longValue())
    }
    val allVals = fileVals.flatten
    (0 until 120).foreach { trial =>
      val (pred, matches): (org.apache.spark.sql.Column, Long => Boolean) =
        rnd.nextInt(5) match {
          case 0 =>
            val v = allVals(rnd.nextInt(allVals.size)) + rnd.nextInt(3) - 1
            (col("n") === v, x => x == v)
          case 1 =>
            val vs = Seq.fill(3)(allVals(rnd.nextInt(allVals.size)))
            (col("n").isin(vs: _*), x => vs.contains(x))
          case 2 =>
            val lo = rnd.nextInt(200).toLong
            val hi = lo + rnd.nextInt(30)
            (col("n") >= lo && col("n") <= hi, x => x >= lo && x <= hi)
          case 3 =>
            val v = rnd.nextInt(200).toLong
            if (rnd.nextBoolean()) (col("n") > v, x => x > v)
            else (col("n") < v, x => x < v)
          case 4 =>
            // disjunctions: equality-or-equality and equality-or-range
            val v1 = allVals(rnd.nextInt(allVals.size))
            if (rnd.nextBoolean()) {
              val v2 = allVals(rnd.nextInt(allVals.size)) + rnd.nextInt(3) - 1
              (col("n") === v1 || col("n") === v2, x => x == v1 || x == v2)
            } else {
              val lo = rnd.nextInt(200).toLong
              (col("n") === v1 || col("n") > lo, x => x == v1 || x > lo)
            }
        }
      val kept = t.planEntries(pred).size
      val filesWithMatch = fileVals.count(_.exists(matches))
      assert(kept >= filesWithMatch,
        s"trial $trial: kept $kept files < $filesWithMatch containing matches")
      val expectedRows = allVals.count(matches)
      assert(t.scan(pred).count() == expectedRows, s"trial $trial rows")
    }
  }
}
