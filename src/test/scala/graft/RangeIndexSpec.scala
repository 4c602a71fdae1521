package graft

import graft.core.RangeIndex
import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Range-bitmap file index: exact range/eq/IN/NULL refutation on the
  * types BSI cannot cover (strings, timestamps, decimals, doubles),
  * plus cross-column row-position intersection. */
class RangeIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-range").toString + "/t"

  private val strSch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("s", StringType, nullable = true)))

  private def sdf(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, strSch)

  test("canonical encodings preserve order for every supported type") {
    val rnd = new scala.util.Random(7)
    val longs = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue) ++
      Seq.fill(200)(rnd.nextLong())
    for (Seq(a, b) <- longs.sorted.sliding(2) if a != b)
      assert(RangeIndex.canonLong(a) < RangeIndex.canonLong(b),
        s"canonLong order broken at ($a, $b)")
    val doubles = Seq(Double.NegativeInfinity, -1.5, -0.0, 0.0, 1.5,
      Double.PositiveInfinity, Double.NaN) ++ Seq.fill(200)(rnd.nextGaussian())
    // Spark double order: -0.0 == 0.0 ties are fine, NaN greatest
    val sortedD = doubles.sortWith((a, b) =>
      java.lang.Double.compare(a, b) < 0)
    // non-strict: -0.0/0.0 deliberately collide (Spark equality)
    for (Seq(a, b) <- sortedD.sliding(2) if java.lang.Double.compare(a, b) != 0)
      assert(RangeIndex.canonIeee(a) <= RangeIndex.canonIeee(b),
        s"canonIeee order broken at ($a, $b)")
    for (Seq(a, b) <- sortedD.sliding(2) if a != b && !(a == 0.0 && b == 0.0))
      assert(RangeIndex.canonIeee(a) < RangeIndex.canonIeee(b),
        s"canonIeee strict order broken at ($a, $b)")
    // -0.0 and 0.0 must collide (Spark treats them as equal)
    assert(RangeIndex.canonIeee(-0.0) == RangeIndex.canonIeee(0.0))
  }

  test("string eq/range/IN prune files whose stats fully overlap") {
    val t = GraftTable.create(spark, tmp(), strSch,
      options = Map(RangeIndex.OptionColumns -> "s"))
    // every file spans a..z lexicographically: stats prune nothing
    t.write(sdf((1L, "apple"), (2L, "zebra")).coalesce(1))
    t.write(sdf((3L, "cherry"), (4L, "zulu")).coalesce(1))
    t.write(sdf((5L, "banana"), (6L, "zed")).coalesce(1))
    assert(t.planEntries(col("s") === "banana").size == 1)
    assert(t.planEntries(col("s").isin("apple", "cherry")).size == 2)
    assert(t.planEntries(col("s") === "durian").isEmpty)
    // range falling between stored values: only dictionary search sees it
    assert(t.planEntries(col("s") >= "az" && col("s") <= "bb").size == 1)
    assert(t.planEntries(col("s") > "cherry" && col("s") < "zebra").isEmpty)
    // exclusive bounds: > "banana" excludes banana itself
    assert(t.planEntries(col("s") > "banana" && col("s") < "cherry").isEmpty)
    assert(t.planEntries(col("s") >= "banana" && col("s") < "cherry").size == 1)
    assert(t.scan(col("s") === "banana").count() == 1)
    assert(t.scan(col("s") >= "az" && col("s") <= "bb").count() == 1)
  }

  test("cross-column position intersection refutes value co-occurrence") {
    val sch2 = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true)))
    def df2(rows: (Long, String)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch2)
    val t = GraftTable.create(spark, tmp(), sch2,
      options = Map(RangeIndex.OptionColumns -> "a,b"))
    // both files hold a=1 AND b="x" — but only f1 on the SAME row.
    // Stats, bloom, bitmap, BSI all keep both; position intersection
    // refutes f2.
    t.write(df2((1L, "x"), (2L, "y")).coalesce(1)) // f1: (1,x) co-occur
    t.write(df2((1L, "y"), (2L, "x")).coalesce(1)) // f2: never together
    assert(t.planEntries(col("a") === 1L && col("b") === "x").size == 1)
    assert(t.scan(col("a") === 1L && col("b") === "x").count() == 1)
    // a=2 AND b="x": only f2
    assert(t.planEntries(col("a") === 2L && col("b") === "x").size == 1)
  }

  test("null, not-equal, and disjunction refutation") {
    val t = GraftTable.create(spark, tmp(), strSch,
      options = Map(RangeIndex.OptionColumns -> "s"))
    t.write(sdf((1L, "only"), (2L, "only")).coalesce(1)) // single value, no nulls
    t.write(sdf((3L, null), (4L, null)).coalesce(1)) // all nulls
    t.write(sdf((5L, "mix"), (6L, null)).coalesce(1))
    assert(t.planEntries(col("s").isNull).size == 2)
    assert(t.planEntries(col("s").isNotNull).size == 2)
    // != refutes the single-value file AND the all-null file
    assert(t.planEntries(col("s") =!= "only").size == 1)
    assert(t.scan(col("s") =!= "only").count() == 1)
    // Or: keep iff any branch might match
    assert(t.planEntries(col("s") === "only" || col("s") === "mix").size == 2)
    assert(t.planEntries(col("s") === "nope" || col("s") === "nada").isEmpty)
    // IS NULL AND a value predicate on the same column: unsatisfiable
    assert(t.planEntries(col("s").isNull && col("s") === "mix").isEmpty)
  }

  test("timestamp, date, decimal and double columns prune by range") {
    val sch3 = StructType(Seq(
      StructField("ts", TimestampType, nullable = true),
      StructField("d", DateType, nullable = true),
      StructField("dec", DecimalType(12, 2), nullable = true),
      StructField("f", DoubleType, nullable = true)))
    def row(ts: String, d: String, dec: String, f: Double) = Row(
      java.sql.Timestamp.valueOf(ts), java.sql.Date.valueOf(d),
      new java.math.BigDecimal(dec), f)
    val t = GraftTable.create(spark, tmp(), sch3,
      options = Map(RangeIndex.OptionColumns -> "ts,d,dec,f"))
    // two files, interleaved so min/max spans overlap fully
    t.write(spark.createDataFrame(Seq(
      row("2024-01-01 00:00:00", "2024-01-01", "10.50", 1.5),
      row("2024-12-31 00:00:00", "2024-12-31", "999.99", 99.5)).asJava, sch3)
      .coalesce(1))
    t.write(spark.createDataFrame(Seq(
      row("2024-06-15 12:00:00", "2024-06-15", "500.00", 50.0),
      row("2024-11-30 00:00:00", "2024-11-30", "800.00", 80.0)).asJava, sch3)
      .coalesce(1))
    assert(t.planEntries(col("ts") >= lit("2024-06-01").cast("timestamp") &&
      col("ts") <= lit("2024-07-01").cast("timestamp")).size == 1)
    assert(t.planEntries(col("d") === lit("2024-06-15").cast("date")).size == 1)
    assert(t.planEntries(col("dec") > lit(new java.math.BigDecimal("400")) &&
      col("dec") < lit(new java.math.BigDecimal("600"))).size == 1)
    assert(t.planEntries(col("f") >= 40.0 && col("f") <= 60.0).size == 1)
    // gap between both files' values
    assert(t.planEntries(col("f") > 1.5 && col("f") < 50.0).isEmpty)
    assert(t.scan(col("f") >= 40.0 && col("f") <= 60.0).count() == 1)
    assert(t.scan(col("dec") > lit(new java.math.BigDecimal("400")) &&
      col("dec") < lit(new java.math.BigDecimal("600"))).count() == 1)
  }

  test("cardinality overflow aborts the sidecar and fails open") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), strSch,
      options = Map(RangeIndex.OptionColumns -> "s"))
    // > MaxCardinality distinct values in ONE file: the aggregator
    // aborts (empty payload), no sidecar is written, scans stay exact
    val n = RangeIndex.MaxCardinality + 1000
    t.write(spark.range(n).select(col("id").as("k"),
      concat(lit("u"), col("id")).as("s")).coalesce(1))
    val entries = t.planEntries(lit(true))
    assert(entries.size == 1)
    assert(!entries.head.file.indexFiles.exists(_.nonEmpty),
      "overflowed sidecar must not be recorded")
    // fail open: the file is kept for any probe, results correct
    assert(t.planEntries(col("s") === "u1").size == 1)
    assert(t.scan(col("s") === "u1").count() == 1)
  }

  test("widenColumn detaches stale sidecars instead of wrong-pruning") {
    val numSch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("c", IntegerType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), numSch,
      options = Map(RangeIndex.OptionColumns -> "c"))
    t.write(spark.createDataFrame(
      Seq(Row(1L, 5), Row(2L, 9)).asJava, numSch).coalesce(1))
    // sanity: the sidecar prunes while the type is stable
    assert(t.planEntries(col("c") === 7).isEmpty)
    t.widenColumn("c", DoubleType)
    val t2 = GraftTable.load(spark, t.path)
    // the stored canonical is canonLong(5); a double probe would
    // canonicalize to canonIeee(5.0) and miss — the widen must detach
    // the sidecar (option strip + option-gated consultation), never
    // silently drop the row
    assert(t2.schema.options.get(RangeIndex.OptionColumns).forall(!_.contains("c")))
    assert(t2.planEntries(col("c") === 5.0).size == 1)
    assert(t2.scan(col("c") === 5.0).count() == 1)
    // re-adding the option + rewrite re-indexes under the new encoding
    t2.setOption(RangeIndex.OptionColumns, "c")
    t2.rewriteFileIndex()
    val t3 = GraftTable.load(spark, t.path)
    assert(t3.planEntries(col("c") === 7.0).isEmpty)
    assert(t3.scan(col("c") === 5.0).count() == 1)
  }

  test("rename keeps the index option tracking the new column name") {
    val t = GraftTable.create(spark, tmp(), strSch,
      options = Map(RangeIndex.OptionColumns -> "s"))
    t.write(sdf((1L, "apple"), (2L, "zebra")).coalesce(1))
    t.renameColumn("s", "txt")
    val t2 = GraftTable.load(spark, t.path)
    assert(t2.schema.options(RangeIndex.OptionColumns) == "txt")
    // index rows are keyed by the column name at write time; sidecar
    // lookups remap by field id, so pruning still engages
    t2.write(sdf((3L, "cherry"), (4L, "zulu"))
      .toDF("k", "txt").coalesce(1))
    assert(t2.planEntries(col("txt") === "cherry").size == 1)
    assert(t2.scan(col("txt") === "cherry").count() == 1)
  }
}
