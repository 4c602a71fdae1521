package graft

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Global secondary (value → data-file) index: one bounded index read
  * resolves =/IN/IS NULL predicates to the exact file set, instead of
  * O(files) per-file sidecar probes. */
class SecondaryIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-sec").toString + "/t"

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("city", StringType, nullable = true)))

  private def df(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch)

  test("equality / IN / IS NULL probes prune to exactly the hit files") {
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map(GraftTable.SecIndexColumns -> "city"))
    // every file's (min, max) range spans a..z, so min/max stats can
    // prune NOTHING here — only the value-level index can
    t.write(df((1L, "aa"), (2L, "mm"), (3L, "zz")).coalesce(1))
    t.write(df((4L, "ab"), (5L, "mn"), (6L, "zy")).coalesce(1))
    t.write(df((7L, "aa"), (8L, null), (9L, "zx")).coalesce(1))
    assert(t.planEntries(lit(true)).size == 3)
    // "aa" lives in files 1 and 3; stats would keep all 3
    assert(t.planEntries(col("city") === "aa").size == 2)
    assert(t.planEntries(col("city") === "mn").size == 1)
    // inside every file's range but present in none
    assert(t.planEntries(col("city") === "mx").isEmpty)
    // IN
    assert(t.planEntries(col("city").isin("mm", "zy")).size == 2)
    // IS NULL: only the third file has nulls
    assert(t.planEntries(col("city").isNull).size == 1)
    // correctness end-to-end
    assert(t.scan(col("city") === "aa").count() == 2)
    assert(t.scan(col("city").isNull).count() == 1)
  }

  test("files written before the index exist are never pruned by it") {
    val p = tmp()
    val t0 = GraftTable.create(spark, p, sch)
    t0.write(df((1L, "tokyo"))) // pre-index file
    t0.setOption(GraftTable.SecIndexColumns, "city")
    val t = GraftTable.load(spark, p)
    t.write(df((2L, "osaka")))
    // "tokyo" only exists in the uncovered file: the index must not
    // prune it even though it has no index rows
    val hits = t.planEntries(col("city") === "tokyo")
    assert(hits.size == 1 && !hits.head.file.secIndexed)
    assert(t.scan(col("city") === "tokyo").count() == 1)
    // rewrite_file_index onboards the old file
    t.rewriteFileIndex()
    val after = GraftTable.load(spark, p)
    assert(after.planEntries(lit(true)).forall(_.file.secIndexed))
    assert(after.planEntries(col("city") === "tokyo").size == 1)
    assert(after.planEntries(col("city") === "nowhere").isEmpty)
    assert(after.scan(col("city") === "tokyo").count() == 1)
  }

  test("index folds past the trigger and stays correct") {
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map(GraftTable.SecIndexColumns -> "city",
        "secondary-index.compact-trigger" -> "3"))
    (0 until 6).foreach(i => t.write(df((i.toLong, s"c$i"))))
    val sidecars = t.sm.latestSnapshot().get.secIndex.get
    assert(sidecars.size <= 5, s"expected folded sidecar list, got $sidecars")
    (0 until 6).foreach { i =>
      assert(t.planEntries(col("city") === s"c$i").size == 1, s"c$i")
    }
    // compaction rewrites files; outputs are re-indexed at commit and
    // stale rows for dead files cannot resurrect them
    t.compact()
    val tc = GraftTable.load(spark, t.path)
    assert(tc.planEntries(col("city") === "c3").size == 1)
    assert(tc.scan(col("city") === "c3").count() == 1)
    // $indexes lists the sidecars with real sizes
    val idxRows = tc.systemIndexes.collect()
    assert(idxRows.nonEmpty &&
      idxRows.forall(r => r.getString(0) == "global-secondary" && r.getLong(2) > 0))
  }

  test("numeric range probes refute ranges stats cannot") {
    val s2 = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n", LongType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), s2,
      options = Map(GraftTable.SecIndexColumns -> "n"))
    def w(vals: Long*) = t.write(spark.createDataFrame(
      vals.zipWithIndex.map { case (v, i) =>
        Row(i.toLong, java.lang.Long.valueOf(v)) }.asJava, s2).coalesce(1))
    // every file's (min, max) span covers [10, 40], but no file holds
    // a value inside it — min/max stats keep all three, the index none
    w(1L, 100L); w(5L, 60L); w(2L, 99L)
    assert(t.planEntries(col("n") >= 10L && col("n") <= 40L).isEmpty)
    assert(t.planEntries(col("n") > 60L).size == 2)
    assert(t.planEntries(col("n") < 2L).size == 1)
    assert(t.planEntries(col("n") >= 99L).size == 2)
    assert(t.scan(col("n") >= 10L && col("n") <= 40L).count() == 0)
    assert(t.scan(col("n") >= 99L).count() == 2)
  }

  test("fold updates keep sidecars appended by concurrent writers") {
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map(GraftTable.SecIndexColumns -> "city"))
    t.write(df((1L, "x")))
    // at read time we saw {a, b} and folded them into {F}; a racer
    // appended {c} before our CAS landed — c's rows exist ONLY in c,
    // so the applied update must keep it
    val update = t.keepUnseen(Set("a", "b"), Seq("F"))
    assert(update(Seq("a", "b", "c")) == Seq("F", "c"))
    assert(update(Seq("a", "b")) == Seq("F"))
    assert(t.keepUnseen(Set.empty, Seq("F"))(Seq("c")) == Seq("F", "c"))
  }

  test("concurrent writers racing folds never lose index coverage") {
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map(GraftTable.SecIndexColumns -> "city",
        "secondary-index.compact-trigger" -> "2")) // folds race appends
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val tw = GraftTable.load(spark, t.path)
            (0 until 3).foreach(i =>
              tw.write(df(((w * 10 + i).toLong, s"w${w}c$i"))))
          }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    val tr = GraftTable.load(spark, t.path)
    for (w <- 0 until 4; i <- 0 until 3) {
      assert(tr.planEntries(col("city") === s"w${w}c$i").size == 1,
        s"w${w}c$i lost from the index")
      assert(tr.scan(col("city") === s"w${w}c$i").count() == 1)
    }
  }

  test("orphan cleanup reclaims superseded sidecars, keeps live ones") {
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map(GraftTable.SecIndexColumns -> "city",
        "secondary-index.compact-trigger" -> "2"))
    (0 until 5).foreach(i => t.write(df((i.toLong, s"c$i"))))
    t.sm.expireSnapshots(retain = 1) // only the latest snapshot's sidecars stay pinned
    val live = t.sm.latestSnapshot().get.secIndex.get.toSet
    val removed = t.removeOrphanFiles(graceMillis = 0L)
    // superseded (pre-fold) sidecars are reclaimed...
    assert(removed.exists(_.startsWith("index-sec/")),
      s"expected superseded index-sec sidecars in $removed")
    // ...but never a sidecar the live snapshot references
    assert(!removed.exists(live.contains), s"deleted live sidecars: $removed")
    // and the index still answers
    (0 until 5).foreach { i =>
      assert(t.planEntries(col("city") === s"c$i").size == 1, s"c$i")
      assert(t.scan(col("city") === s"c$i").count() == 1)
    }
  }

  test("widened numeric column keeps matching via canonical values") {
    val s2 = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n", IntegerType, nullable = true)))
    val p = tmp()
    val t = GraftTable.create(spark, p, s2,
      options = Map(GraftTable.SecIndexColumns -> "n"))
    t.write(spark.createDataFrame(
      Seq(Row(1L, Integer.valueOf(5)), Row(2L, Integer.valueOf(7))).asJava, s2)
      .coalesce(1))
    t.widenColumn("n", DoubleType)
    val t2 = GraftTable.load(spark, p)
    t2.write(spark.createDataFrame(
      Seq(Row(3L, java.lang.Double.valueOf(5.0))).asJava,
      StructType(Seq(StructField("k", LongType, nullable = false),
        StructField("n", DoubleType, nullable = true)))).coalesce(1))
    // the int-era file must still hit for the double-typed literal
    assert(t2.planEntries(col("n") === 5.0d).size == 2)
    assert(t2.planEntries(col("n") === 9.5d).isEmpty)
    assert(t2.scan(col("n") === 5.0d).count() == 2)
  }

  test("timestamp probes survive a session timezone change") {
    val s2 = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), s2,
      options = Map(GraftTable.SecIndexColumns -> "ts"))
    val ts1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T12:00:00Z"))
    val ts2 = java.sql.Timestamp.from(java.time.Instant.parse("2024-07-01T00:30:00Z"))
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      t.write(spark.createDataFrame(Seq(Row(1L, ts1)).asJava, s2).coalesce(1))
      t.write(spark.createDataFrame(Seq(Row(2L, ts2)).asJava, s2).coalesce(1))
      // read under a DIFFERENT session timezone: the epoch-seconds
      // canonical form must still hit (a rendered-string form would
      // shift by the offset and wrong-prune)
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      assert(t.planEntries(col("ts") === lit(ts1)).size == 1)
      assert(t.scan(col("ts") === lit(ts1)).count() == 1)
      assert(t.planEntries(col("ts") === lit(ts2)).size == 1)
      assert(t.planEntries(
        col("ts") === lit(java.sql.Timestamp.from(
          java.time.Instant.parse("1999-01-01T00:00:00Z")))).isEmpty)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("timestamp_ntz indexed column writes and probes correctly") {
    val s2 = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("ts", TimestampNTZType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), s2,
      options = Map(GraftTable.SecIndexColumns -> "ts"))
    val v1 = java.time.LocalDateTime.parse("2024-03-01T12:00:00")
    val v2 = java.time.LocalDateTime.parse("2024-07-01T00:30:00")
    t.write(spark.createDataFrame(Seq(Row(1L, v1)).asJava, s2).coalesce(1))
    t.write(spark.createDataFrame(Seq(Row(2L, v2)).asJava, s2).coalesce(1))
    assert(t.planEntries(col("ts") === lit(v1)).size == 1)
    assert(t.scan(col("ts") === lit(v1)).count() == 1)
    assert(t.planEntries(
      col("ts") === lit(java.time.LocalDateTime.parse("1999-01-01T00:00:00"))).isEmpty)
  }

  test("renamed column keeps pruning via stable field ids") {
    val p = tmp()
    val t = GraftTable.create(spark, p, sch,
      options = Map(GraftTable.SecIndexColumns -> "city"))
    t.write(df((1L, "tokyo")))
    // renameColumn rewrites secondary-index.columns itself (index rows
    // are keyed by stable field id, only the option string moves)
    t.renameColumn("city", "town")
    val t3 = GraftTable.load(spark, p)
    assert(t3.schema.options(GraftTable.SecIndexColumns) == "town")
    t3.write(df((2L, "osaka")).withColumnRenamed("city", "town"))
    assert(t3.planEntries(col("town") === "tokyo").size == 1)
    assert(t3.planEntries(col("town") === "nowhere").isEmpty)
    assert(t3.scan(col("town") === "tokyo").count() == 1)
  }

  test("Or-of-probeable predicates prunes via union hit-sets") {
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map(GraftTable.SecIndexColumns -> "k,city"))
    t.write(df((1L, "ant"), (2L, "tokyo")).coalesce(1))
    t.write(df((3L, "arc"), (4L, "zebra")).coalesce(1))
    t.write(df((5L, "axe"), (6L, "zulu")).coalesce(1))
    // same-column disjunction merges into one IN-style probe
    assert(t.planEntries(col("city") === "tokyo" || col("city") === "zulu").size == 2)
    assert(t.scan(col("city") === "tokyo" || col("city") === "zulu").count() == 2)
    // cross-column disjunction: union of an equality and a range probe
    assert(t.planEntries(col("city") === "zebra" || col("k") > 5L).size == 2)
    assert(t.scan(col("city") === "zebra" || col("k") > 5L).count() == 2)
    // a branch on an UN-probeable shape fails the whole Or open
    assert(t.planEntries(col("city") === "zebra" ||
      col("city").contains("oky")).size == 3)
    assert(t.scan(col("city") === "zebra" ||
      col("city").contains("oky")).count() == 2)
    // an unsatisfiable disjunction prunes everything
    assert(t.planEntries(col("city") === "nope" || col("city") === "nada").isEmpty)
  }

  test("prefix predicates (LIKE 'p%', startsWith) probe the index exactly") {
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map(GraftTable.SecIndexColumns -> "city"))
    // every file's [min, max] spans a..z, so string stats prune
    // NOTHING — only the index can refute the prefixes
    t.write(df((1L, "ant"), (2L, "tokyo")).coalesce(1))
    t.write(df((3L, "arc"), (4L, "zebra")).coalesce(1))
    t.write(df((5L, "axe"), (6L, "zulu")).coalesce(1))
    assert(t.planEntries(col("city").startsWith("to")).size == 1)
    assert(t.planEntries(col("city").startsWith("z")).size == 2)
    assert(t.planEntries(col("city").startsWith("q")).isEmpty)
    assert(t.scan(col("city").startsWith("to")).count() == 1)
    assert(t.scan(col("city").startsWith("a")).count() == 3)
    // SQL LIKE with a pure prefix pattern takes the same probe;
    // patterns with inner wildcards stay un-probed (fail open)
    assert(t.planEntries(col("city").like("ze%")).size == 1)
    assert(t.planEntries(col("city").like("%o")).size == 3)
    assert(t.scan(col("city").like("ze%")).count() == 1)
    assert(t.scan(col("city").like("%o")).count() == 1)
  }

  test("probe cap fails open on saturating values, exact below it") {
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map(GraftTable.SecIndexColumns -> "city",
        "secondary-index.max-probe-hits" -> "2"))
    // "hot" appears in 4 files -> 4 hit rows > cap=2 -> fail open:
    // every candidate kept, results still correct
    (0 until 4).foreach(i =>
      t.write(df((i.toLong, "hot"), (100L + i, s"u$i")).coalesce(1)))
    assert(t.planEntries(col("city") === "hot").size == 4)
    assert(t.scan(col("city") === "hot").count() == 4)
    // a cold value stays under the cap and prunes exactly
    assert(t.planEntries(col("city") === "u2").size == 1)
    assert(t.scan(col("city") === "u2").count() == 1)
  }

  test("column added to the index option is not probed until rewrite") {
    val s3 = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true)))
    def df3(rows: (Long, String, String)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, s3)
    val p = tmp()
    val t = GraftTable.create(spark, p, s3,
      options = Map(GraftTable.SecIndexColumns -> "a"))
    // b-ranges of both files overlap "hot", so min/max stats cannot
    // prune either — only the (incomplete) index could, wrongly
    t.write(df3((1L, "ax", "hot"), (2L, "zx", "zzz")).coalesce(1)) // indexed for a only
    t.setOption(GraftTable.SecIndexColumns, "a,b")
    val t2 = GraftTable.load(spark, p)
    t2.write(df3((3L, "ay", "aaa"), (4L, "zy", "zzy")).coalesce(1)) // indexed for a and b
    // the first file is secIndexed but has NO rows for b: probing b
    // would wrongly prune it — b must stay un-probed (fail open)
    assert(t2.planEntries(col("b") === "hot").size == 2)
    assert(t2.scan(col("b") === "hot").count() == 1)
    // a stays fully covered and keeps pruning (both a-ranges span
    // "ax".."zx"-ish, so this is the index, not stats)
    assert(t2.planEntries(col("a") === "ax").size == 1)
    assert(t2.planEntries(col("a") === "mm").isEmpty)
    // full rebuild onboards b for every file
    t2.rewriteFileIndex()
    val t4 = GraftTable.load(spark, p)
    assert(t4.planEntries(col("b") === "hot").size == 1)
    assert(t4.planEntries(col("b") === "nope").isEmpty)
    assert(t4.scan(col("b") === "hot").count() == 1)
  }

  test("string range probes: lexicographic intervals, exact bounds") {
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map(GraftTable.SecIndexColumns -> "city"))
    // all files span a..z so stats prune nothing; the index stores the
    // raw strings, so interval probes are exact
    t.write(df((1L, "apple"), (2L, "zebra")).coalesce(1))
    t.write(df((3L, "cherry"), (4L, "zulu")).coalesce(1))
    t.write(df((5L, "banana"), (6L, "zed")).coalesce(1))
    // interval between stored values
    assert(t.planEntries(col("city") >= "az" && col("city") <= "bb").size == 1)
    assert(t.planEntries(col("city") > "cherry" && col("city") < "zebra").isEmpty)
    // exclusive vs inclusive boundary on an exact stored value
    assert(t.planEntries(col("city") > "banana" && col("city") < "cherry").isEmpty)
    assert(t.planEntries(col("city") >= "banana" && col("city") < "cherry").size == 1)
    // one-sided bounds
    assert(t.planEntries(col("city") > "zu").size == 1) // only zulu
    assert(t.planEntries(col("city") < "az").size == 1) // only apple
    // unsatisfiable merged interval prunes everything
    assert(t.planEntries(col("city") > "x" && col("city") < "b").isEmpty)
    // results stay correct through the scan
    assert(t.scan(col("city") >= "az" && col("city") <= "bb").count() == 1)
    assert(t.scan(col("city") > "zu").count() == 1)
  }

  test("timestamp range probes refute gaps inside overlapping stats spans") {
    val tsch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true)))
    def tdf(rows: (Long, String)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, java.sql.Timestamp.valueOf(r._2))).asJava, tsch)
    val t = GraftTable.create(spark, tmp(), tsch,
      options = Map(GraftTable.SecIndexColumns -> "ts"))
    // nested spans: every file's [min, max] contains the probe window,
    // so stats keep all three — only stored-value probes can refute
    t.write(tdf((1L, "2024-01-01 01:00:00"), (2L, "2024-01-01 09:00:00")).coalesce(1))
    t.write(tdf((3L, "2024-01-01 02:00:00"), (4L, "2024-01-01 08:00:00")).coalesce(1))
    t.write(tdf((5L, "2024-01-01 03:00:00"), (6L, "2024-01-01 07:00:00")).coalesce(1))
    def tsLit(s: String) = lit(s).cast("timestamp")
    assert(t.planEntries(col("ts") >= tsLit("2024-01-01 03:30:00") &&
      col("ts") <= tsLit("2024-01-01 04:30:00")).isEmpty)
    assert(t.planEntries(col("ts") >= tsLit("2024-01-01 02:50:00") &&
      col("ts") <= tsLit("2024-01-01 03:10:00")).size == 1)
    assert(t.scan(col("ts") >= tsLit("2024-01-01 02:50:00") &&
      col("ts") <= tsLit("2024-01-01 03:10:00")).count() == 1)
    // sub-second bounds floor conservatively: a probe just below a
    // stored second keeps that file
    assert(t.planEntries(col("ts") >= tsLit("2024-01-01 06:59:59.2") &&
      col("ts") <= tsLit("2024-01-01 07:00:00.8")).size == 1)
  }
}
