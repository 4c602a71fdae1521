package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Regression tests for the round-1 advisory findings: stale reads via
  * value-predicate pruning on PK tables, PK-table overwrite, MERGE
  * insert values, deletion-vector changelog semantics, compaction
  * levels, and manifest-list compaction.
  */
class TableIntegritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-test").toString + "/t"

  import scala.jdk.CollectionConverters._

  private val kvSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("n", LongType, nullable = true),
    StructField("seq", LongType, nullable = true)))

  private def kvDf(rows: (Long, String, java.lang.Long, Long)*): DataFrame =
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, kvSchema)

  test("pk table: value predicate must not resolve to superseded rows") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq", "bucket" -> "1"))
    t.write(kvDf((1L, "old", 30L, 1L)))   // file A: n=30
    t.write(kvDf((1L, "new", 100L, 2L)))  // file B: n=100 (wins the merge)
    // n < 50 matches file A's stats only; pruning by it would merge to
    // the stale row. Current state of k=1 is n=100 → no match.
    assert(t.scan(col("n") < 50L).count() == 0)
    // the current version is still found through a matching predicate
    val hit = t.scan(col("n") > 50L).collect()
    assert(hit.length == 1 && hit.head.getString(1) == "new")
    // pk-column predicates still prune (safe: every version co-hashes)
    assert(t.scan(col("k") === 1L).count() == 1)
  }

  test("pk table: overwrite replaces content and stays readable") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq", "bucket" -> "2"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L), (3L, "c", 30L, 1L)))
    t.overwrite(kvDf((9L, "z", 90L, 1L)))
    val rows = t.read.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 9L)
    // post-overwrite upserts still merge correctly
    t.write(kvDf((9L, "z2", 91L, 2L)))
    assert(t.read.head.getString(1) == "z2")
  }

  test("pk table: partitioned overwrite replaces only touched partitions") {
    val sch = StructType(Seq(
      StructField("p", StringType, nullable = false),
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    def df(rows: (String, Long, String)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, sch)
    val t = GraftTable.create(spark, tmp(), sch,
      partitionKeys = Seq("p"), primaryKeys = Seq("p", "k"))
    t.write(df(("a", 1L, "x"), ("b", 2L, "y")))
    t.overwrite(df(("a", 9L, "w")))
    val got = t.read.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("b", 2L), ("a", 9L)))
  }

  test("merge into: inserted rows carry source values, not update assignments") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t.write(kvDf((1L, "a", 10L, 1L)))
    // matched k=1 gets v := "upd"; unmatched k=2 must insert v="src"
    t.mergeInto(
      kvDf((1L, "s1", 11L, 2L), (2L, "src", 20L, 2L)),
      whenMatchedUpdate = Some(Map("v" -> lit("upd"))))
    val got = t.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "upd"), (2L, "src")))
  }

  test("incremental read over deletion-vector commits emits -D, not re-adds") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      options = Map("deletion-vectors.enabled" -> "true"))
    t.write(kvDf((1L, "a", 10L, 0L), (2L, "b", 20L, 0L), (3L, "c", 30L, 0L)))
    t.delete(col("k") === 2L) // DV commit: delete + re-ADD of the same file
    val delta = t.incrementalRead(0L, 1L)
      .select("k", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(delta == Set((2L, "-D")))
    // a second, growing DV on the same file adds only the new deletion
    t.delete(col("k") === 3L)
    val delta2 = t.incrementalRead(1L, 2L)
      .select("k", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(delta2 == Set((3L, "-D")))
  }

  test("incremental read emits -D for dropped partitions") {
    val sch = StructType(Seq(
      StructField("p", StringType, nullable = false),
      StructField("k", LongType, nullable = false)))
    def df(rows: (String, Long)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch)
    val t = GraftTable.create(spark, tmp(), sch, partitionKeys = Seq("p"))
    t.write(df(("a", 1L), ("b", 2L)))
    t.delete(col("p") === "b") // metadata-only partition drop
    val delta = t.incrementalRead(0L, 1L)
      .select("k", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(delta == Set((2L, "-D")))
  }

  test("compaction output commits at level 1 (manifest-count fast path)") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq", "bucket" -> "2"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L)))
    t.write(kvDf((1L, "a2", 11L, 2L), (3L, "c", 30L, 1L)))
    t.compact()
    val levels = t.systemFiles.select("level").collect().map(_.getInt(0)).toSet
    assert(levels == Set(1))
    // fast-path preconditions hold: one file per bucket, level > 0
    assert(t.countRows() == 3L)
  }

  test("manifest list stays bounded across many commits") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      options = Map("manifest.merge-min-count" -> "5"))
    (1 to 17).foreach(i => t.write(kvDf((i.toLong, s"v$i", i.toLong, 0L))))
    val sm = new graft.core.SnapshotManager(t.path)
    val latest = sm.latestSnapshot().get
    assert(sm.readManifestList(latest.manifestList).size <= 5)
    // the fold preserved every live file and the data itself
    assert(sm.liveEntries(latest).size == t.read.inputFiles.length)
    assert(t.read.count() == 17)
    assert(t.read.select(sum("n")).head.getLong(0) == (1 to 17).sum.toLong)
    // incremental reads still work: delta manifests survive the merge
    assert(t.incrementalRead(9L, 12L).count() == 3)
    // compaction rebases the list to a single manifest
    t.compact()
    val afterCompact = sm.latestSnapshot().get
    assert(sm.readManifestList(afterCompact.manifestList).size == 1)
    assert(t.read.count() == 17)
    // expiration after merging can reclaim old manifests
    t.expireSnapshots(retain = 2)
    assert(t.read.count() == 17)
    assert(t.incrementalRead(16L, 17L).count() == 0 ||
      t.incrementalRead(16L, 17L).count() >= 0) // no crash on expired range
  }

  test("cross-partition upsert: partition predicates stay correct when keys move") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("region", StringType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    def df(rows: (Long, String, String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, sch)
    // partition key OUTSIDE the primary key: a key may move partitions
    val t = GraftTable.create(spark, tmp(), sch,
      partitionKeys = Seq("region"), primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "bucket" -> "2"))
    t.write(df((1L, "eu", "old", 1L), (2L, "us", "x", 1L)))
    t.write(df((1L, "us", "new", 2L))) // key 1 moves eu -> us
    // scanning the OLD partition must not resurrect the stale version
    assert(t.scan(col("region") === "eu").count() == 0)
    val us = t.scan(col("region") === "us").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(us.toSeq == Seq((1L, "new"), (2L, "x")))
    // compaction physically drops the stale eu copy
    t.compact()
    assert(t.read.count() == 2)
  }

  test("dynamic buckets: keys keep their bucket, new buckets appear as data grows") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "bucket" -> "-1",
        "dynamic-bucket.target-row-num" -> "10"))
    t.write(kvDf((0L until 8L).map(i => (i, s"v$i", i: java.lang.Long, 1L)): _*))
    val bucketsAfter1 = t.systemFiles.select("bucket").collect().map(_.getInt(0)).toSet
    // more data → bucket range grows
    t.write(kvDf((8L until 30L).map(i => (i, s"v$i", i: java.lang.Long, 1L)): _*))
    val bucketsAfter2 = t.systemFiles.select("bucket").collect().map(_.getInt(0)).toSet
    assert(bucketsAfter2.size > bucketsAfter1.size,
      s"expected bucket growth: $bucketsAfter1 -> $bucketsAfter2")
    // upserting existing keys must NOT move them to new buckets: the
    // merged table has exactly one row per key
    t.write(kvDf((0L until 30L).map(i => (i, s"u$i", i: java.lang.Long, 2L)): _*))
    assert(t.read.count() == 30)
    val got = t.read.filter(col("k") === 3L).collect()
    assert(got.length == 1 && got.head.getString(1) == "u3")
    // per-key bucket is unique across all raw versions
    val dup = t.readRaw(t.sm.latestSnapshot().map(t.sm.liveEntries).get)
      .select(col("k"), col("__bucket")).distinct()
      .groupBy("k").count().filter(col("count") > 1).count()
    assert(dup == 0, "a key must never appear in two buckets")
    // lookup and compaction stay correct without hash-derived buckets
    assert(t.lookup(Map("k" -> 7L)).head.getString(1) == "u7")
    t.compact()
    assert(t.read.count() == 30)
    assert(t.lookup(Map("k" -> 7L)).head.getString(1) == "u7")
  }

  test("simhash blocking finds every planted pair at the hamming bound") {
    import spark.implicits._
    // pairs planted at exactly maxHamming bits apart, including one
    // crossing all four of the old fixed 16-bit chunks
    for (h <- Seq(0, 3, 7)) {
      val base = 0x0123456789abcdefL
      val flipped = (0 until h).foldLeft(base)((v, i) => v ^ (1L << (i * 61 % 64)))
      val spread = (0 until h).foldLeft(base)((v, i) => v ^ (1L << (i * 16 + 1)))
      val sh = Seq((1L, base), (2L, flipped), (3L, spread))
        .toDF("id", "sh")
      val pairs = graft.operators.Dedup.simhashPairs(sh, maxHamming = h)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"missed flipped pair at hamming $h")
      assert(pairs.contains((1L, 3L)), s"missed spread pair at hamming $h")
    }
  }

  test("commit.strict-mode.last-safe-snapshot aborts on foreign COMPACT/" +
    "OVERWRITE after the safe point; foreign APPEND blocks only overwrites") {
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    def df(rows: (Long, String)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2)).asJava, sch)
    // foreign APPEND after the safe point: plain appends coexist,
    // an OVERWRITE by the strict writer aborts (it would drop the
    // foreign append's rows)
    val dir1 = tmp()
    val w1 = GraftTable.create(spark, dir1, sch,
      options = Map("commit.strict-mode.last-safe-snapshot" -> "-1"))
    val other1 = GraftTable.load(spark, dir1) // separate manager = separate user
    other1.write(df((1L, "foreign")))
    w1.write(df((2L, "mine"))) // APPEND + foreign APPEND: fine
    val e1 = intercept[IllegalStateException] { w1.overwrite(df((3L, "ow"))) }
    assert(e1.getMessage.contains("strict mode"), e1.getMessage)
    // foreign OVERWRITE after the safe point blocks EVERY commit kind
    val dir2 = tmp()
    val w2 = GraftTable.create(spark, dir2, sch,
      options = Map("commit.strict-mode.last-safe-snapshot" -> "-1"))
    GraftTable.load(spark, dir2).overwrite(df((1L, "foreign-ow")))
    val e2 = intercept[IllegalStateException] { w2.write(df((2L, "mine"))) }
    assert(e2.getMessage.contains("OVERWRITE"), e2.getMessage)
    // the safe point excuses history at or before it: pointing it AT
    // the foreign overwrite lets the writer proceed
    w2.setOption("commit.strict-mode.last-safe-snapshot",
      w2.sm.latestSnapshotId.get.toString)
    val w2b = GraftTable.load(spark, dir2)
    w2b.write(df((2L, "mine")))
    assert(w2b.read.count() == 2L)
  }
}
