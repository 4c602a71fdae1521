package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Table-format kernel tests: commit/read loop, merge engines, DML,
  * compaction, time travel, incremental reads. Mirrors the reference's
  * randomized write → read-back-verify pattern (TestFileStore) at
  * deterministic small scale.
  */
class GraftTableSpec extends AnyFunSuite {

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

  test("append table: write, read back, second append accumulates") {
    val t = GraftTable.create(spark, tmp(), kvSchema)
    t.write(kvDf((1L, "a", 10L, 0L), (2L, "b", 20L, 0L)))
    assert(t.read.count() == 2)
    t.write(kvDf((3L, "c", 30L, 0L)))
    assert(t.read.count() == 3)
    assert(t.read.select(sum("n")).head.getLong(0) == 60L)
    assert(t.systemSnapshots.count() == 2)
  }

  test("append table: overwrite replaces content") {
    val t = GraftTable.create(spark, tmp(), kvSchema)
    t.write(kvDf((1L, "a", 10L, 0L), (2L, "b", 20L, 0L)))
    t.overwrite(kvDf((9L, "z", 90L, 0L)))
    val rows = t.read.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 9L)
  }

  test("partitioned append: dynamic partition overwrite replaces only touched partitions") {
    val sch = StructType(Seq(
      StructField("p", StringType, nullable = false),
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    def df(rows: (String, Long, String)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, sch)
    val t = GraftTable.create(spark, tmp(), sch, partitionKeys = Seq("p"))
    t.write(df(("a", 1L, "x"), ("b", 2L, "y")))
    t.overwrite(df(("a", 9L, "w")))
    val got = t.read.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("b", 2L), ("a", 9L)))
  }

  test("scan prunes files by partition and stats") {
    val sch = StructType(Seq(
      StructField("p", StringType, nullable = false),
      StructField("k", LongType, nullable = false)))
    def df(rows: (String, Long)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch)
    val t = GraftTable.create(spark, tmp(), sch, partitionKeys = Seq("p"))
    t.write(df(("a", 1L)))
    t.write(df(("b", 100L)))
    t.write(df(("c", 200L)))
    assert(t.read.inputFiles.length == 3)
    // partition pruning
    assert(t.scan(col("p") === "a").inputFiles.length == 1)
    assert(t.scan(col("p") === "a").collect().map(_.getLong(1)).toSeq == Seq(1L))
    // stats (min/max) pruning on data column
    assert(t.scan(col("k") > 150L).inputFiles.length == 1)
    assert(t.scan(col("k") > 150L).head.getLong(1) == 200L)
  }

  test("pk table: deduplicate keeps latest by sequence field") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq", "bucket" -> "2"))
    t.write(kvDf((1L, "a1", 10L, 1L), (2L, "b1", 20L, 1L)))
    t.write(kvDf((1L, "a2", 11L, 2L), (3L, "c1", 30L, 1L)))
    val got = t.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2"), (2L, "b1"), (3L, "c1")))
    // out-of-order (late) write with lower seq must NOT win
    t.write(kvDf((1L, "a0", 9L, 0L)))
    assert(t.read.filter(col("k") === 1L).head.getString(1) == "a2")
  }

  test("pk table: delete row kind removes key; audit log exposes kinds") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L)))
    t.delete(col("k") === 1L)
    assert(t.read.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val kinds = t.auditLog.select("_row_kind").collect().map(_.getString(0)).toSet
    assert(kinds.contains("-D") && kinds.contains("+I"))
  }

  test("pk table: update rewrites values as +U") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L)))
    t.update(Map("v" -> lit("updated"), "seq" -> lit(5L)), col("k") === 2L)
    val got = t.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "updated")))
  }

  test("append table: delete and update rewrite touched files only") {
    val t = GraftTable.create(spark, tmp(), kvSchema)
    t.write(kvDf((1L, "a", 10L, 0L), (2L, "b", 20L, 0L)))
    t.write(kvDf((100L, "z", 30L, 0L)))
    t.delete(col("k") === 1L)
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 100L))
    t.update(Map("v" -> lit("upd")), col("k") === 100L)
    assert(t.read.filter(col("k") === 100L).head.getString(1) == "upd")
    assert(t.read.filter(col("k") === 2L).head.getString(1) == "b")
  }

  test("merge into: update + delete + insert clauses") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L), (3L, "c", 30L, 1L)))
    // source: updates k=1, deletes k=2 (n<0 marker), inserts k=4
    val src = kvDf((1L, "a2", 11L, 2L), (2L, "b2", -1L, 2L), (4L, "d", 40L, 2L))
    t.mergeInto(src,
      whenMatchedDelete = Some(col("n") < 0L))
    val got = t.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2"), (3L, "c"), (4L, "d")))
  }

  test("merge into gates the target-slice broadcast by manifest bytes") {
    import scala.jdk.CollectionConverters._
    // wide slice (threshold 1 byte): the touched target must NOT
    // broadcast — the join pins sort-merge and still merges correctly
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq",
        "join.broadcast-max-bytes" -> "1"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L)))
    GraftTable.joinGateDecisions.clear()
    t.mergeInto(kvDf((1L, "a2", 11L, 2L), (3L, "c", 30L, 2L)))
    val wide = GraftTable.joinGateDecisions.asScala
      .filter(_._1 == "merge-into").toSeq
    assert(wide.nonEmpty && wide.forall(!_._3),
      s"a wide target slice must not broadcast: $wide")
    val got = t.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2"), (2L, "b"), (3L, "c")))
    // default threshold: the small touched slice broadcasts
    val t2 = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t2.write(kvDf((1L, "a", 10L, 1L)))
    GraftTable.joinGateDecisions.clear()
    t2.mergeInto(kvDf((1L, "a2", 11L, 2L)))
    val small = GraftTable.joinGateDecisions.asScala
      .filter(_._1 == "merge-into").toSeq
    assert(small.nonEmpty && small.forall(_._3),
      s"a small touched slice should broadcast: $small")
  }

  test("merge into computes its source exactly once") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L)))
    // an accumulator-instrumented source: each evaluation of a source
    // row bumps the counter, so n rows evaluated twice would show 2n
    val evals = spark.sparkContext.longAccumulator("src-evals")
    val bump = udf((k: Long) => { evals.add(1L); k })
    val src = kvDf((1L, "a2", 11L, 2L), (3L, "c", 30L, 1L))
      .withColumn("k", bump(col("k")))
    t.mergeInto(src)
    assert(t.read.count() == 3)
    assert(evals.value == 2L,
      s"source evaluated ${evals.value} row-computations for 2 rows — " +
        "the source must be pinned and computed once")
  }

  test("compaction merges files and preserves data; deletes are dropped") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq", "bucket" -> "2"))
    t.write(kvDf((1L, "a1", 10L, 1L)))
    t.write(kvDf((1L, "a2", 11L, 2L), (2L, "b", 20L, 1L)))
    t.delete(col("k") === 2L)
    val before = t.systemFiles.count()
    t.compact()
    assert(t.systemFiles.count() < before)
    val got = t.read.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2")))
    // audit log after full compaction has no deletes left
    assert(!t.auditLog.select("_row_kind").collect().map(_.getString(0)).contains("-D"))
    // post-compaction upsert still wins over compacted rows
    t.write(kvDf((1L, "a3", 12L, 3L)))
    assert(t.read.filter(col("k") === 1L).head.getString(1) == "a3")
  }

  test("time travel: versionAsOf, tags, expiration keeps live data") {
    val t = GraftTable.create(spark, tmp(), kvSchema)
    t.write(kvDf((1L, "a", 10L, 0L)))
    t.createTag("v1")
    t.write(kvDf((2L, "b", 20L, 0L)))
    t.write(kvDf((3L, "c", 30L, 0L)))
    assert(t.versionAsOf(0L).count() == 1)
    assert(t.readTag("v1").count() == 1)
    assert(t.read.count() == 3)
    val dropped = t.expireSnapshots(retain = 2)
    assert(dropped.nonEmpty)
    assert(t.read.count() == 3) // latest unaffected
  }

  test("incremental read returns per-snapshot deltas with row kinds") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t.write(kvDf((1L, "a", 10L, 1L)))
    t.write(kvDf((2L, "b", 20L, 1L)))
    t.delete(col("k") === 1L)
    val delta = t.incrementalRead(0L, 2L)
    val kinds = delta.select("k", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kinds == Set((2L, "+I"), (1L, "-D")))
  }

  test("partial-update merge engine: last non-null per field") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"),
      options = Map("merge-engine" -> "partial-update", "sequence.field" -> "seq"))
    t.write(kvDf((1L, "v1", null, 1L)))
    t.write(kvDf((1L, null, 42L, 2L)))
    val r = t.read.head
    assert(r.getString(1) == "v1" && r.getLong(2) == 42L)
  }

  test("aggregation merge engine: per-field aggregate functions") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "aggregation",
        "sequence.field" -> "seq",
        "fields.n.aggregate-function" -> "sum",
        "fields.v.aggregate-function" -> "last_value"))
    t.write(kvDf((1L, "x1", 10L, 1L)))
    t.write(kvDf((1L, "x2", 5L, 2L)))
    val r = t.read.head
    assert(r.getString(1) == "x2" && r.getLong(2) == 15L)
  }

  test("aggregation engine: fields.default-aggregate-function covers unlisted fields") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "aggregation",
        "sequence.field" -> "seq",
        "fields.default-aggregate-function" -> "sum",
        "fields.v.aggregate-function" -> "last_value"))
    t.write(kvDf((1L, "x1", 10L, 1L)))
    t.write(kvDf((1L, "x2", 5L, 2L)))
    val r = t.read.head
    // n has no per-field function → the default (sum) applies; v's own
    // last_value overrides the default
    assert(r.getString(1) == "x2" && r.getLong(2) == 15L)
  }

  test("snapshots carry a commit user; commit.user-prefix labels it") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      options = Map("commit.user-prefix" -> "etl-job"))
    t.write(kvDf((1L, "a", 1L, 1L)))
    t.write(kvDf((2L, "b", 2L, 2L)))
    val users = t.systemSnapshots.select("commit_user")
      .collect().map(_.getString(0)).toSeq
    assert(users.forall(_ != null) && users.distinct.size == 1,
      s"one writer instance = one user: $users")
    assert(users.head.startsWith("etl-job-"), users.head)
    // a different writer instance gets a different identity
    val t2 = GraftTable.load(spark, t.path)
    t2.write(kvDf((3L, "c", 3L, 3L)))
    val users2 = t2.systemSnapshots.select("commit_user")
      .collect().map(_.getString(0)).toSeq
    assert(users2.distinct.size == 2, users2.toString)
  }

  test("file.compression selects the parquet codec for data files") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      options = Map("file.compression" -> "zstd"))
    t.write(kvDf((1L, "a", 1L, 1L), (2L, "b", 2L, 2L)))
    val files = t.read.inputFiles
    assert(files.nonEmpty)
    // the staged files are renamed on adoption, so check the codec the
    // parquet FOOTER records, as any external reader would
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(files.head),
        spark.sparkContext.hadoopConfiguration))
    val codec = try reader.getFooter.getBlocks.get(0)
      .getColumns.get(0).getCodec.toString
    finally reader.close()
    assert(codec == "ZSTD", codec)
    assert(t.read.count() == 2)
  }

  test("partial-update: remove-record-on-delete resets the row") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "partial-update",
        "sequence.field" -> "seq",
        "partial-update.remove-record-on-delete" -> "true"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L)))
    t.write(kvDf((1L, null, 11L, 2L))) // partial: v keeps "a", n -> 11
    assert(t.read.filter(col("k") === 1L).head.getString(1) == "a")
    // a delete REMOVES the row (default partial-update ignores it)
    t.delete(col("k") === 1L)
    assert(t.read.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // a post-delete write rebuilds from scratch: old fields do NOT
    // leak back through the partial fold
    t.write(kvDf((1L, null, 99L, 10L)))
    val r = t.read.filter(col("k") === 1L).head
    assert(r.isNullAt(1) && r.getLong(2) == 99L,
      s"row must rebuild from empty after delete: $r")
    // compaction folds the tombstoned history without resurrecting
    t.compact()
    assert(t.read.count() == 2)
  }

  test("aggregation: remove-record-on-delete resets accumulated state") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"),
      options = Map(
        "merge-engine" -> "aggregation",
        "fields.n.aggregate-function" -> "sum",
        "fields.v.aggregate-function" -> "last_non_null_value",
        "aggregation.remove-record-on-delete" -> "true"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 5L, 1L)))
    t.write(kvDf((1L, "a2", 7L, 2L)))
    assert(t.read.filter(col("k") === 1L).head.getLong(2) == 17L)
    // -D removes the whole row (default aggregation would retract)
    t.delete(col("k") === 1L)
    assert(t.read.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // post-delete writes rebuild the sum from zero — pre-delete
    // contributions never leak back
    t.write(kvDf((1L, "z", 3L, 3L)))
    val r = t.read.filter(col("k") === 1L).head
    assert(r.getLong(2) == 3L && r.getString(1) == "z", r.toString)
    // survives compaction
    t.compact()
    assert(t.read.filter(col("k") === 1L).head.getLong(2) == 3L)
  }

  test("dynamic-partition-overwrite=false makes INSERT OVERWRITE replace the whole table") {
    val sch = StructType(Seq(
      StructField("p", StringType, nullable = false),
      StructField("k", LongType, nullable = false)))
    def df(rows: (String, Long)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch)
    val t = GraftTable.create(spark, tmp(), sch, partitionKeys = Seq("p"),
      options = Map("dynamic-partition-overwrite" -> "false"))
    t.write(df(("a", 1L), ("b", 2L)))
    t.overwrite(df(("a", 9L)))
    // static overwrite: partition b is GONE, not kept
    assert(t.read.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == Set(("a", 9L)))
  }

  test("dynamic-bucket initial-buckets seeds and max-buckets caps growth") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "-1",
        "dynamic-bucket.target-row-num" -> "2",
        "dynamic-bucket.initial-buckets" -> "4",
        "dynamic-bucket.max-buckets" -> "6"))
    t.write(kvDf((1L to 4L).map(i => (i, s"v$i", i: java.lang.Long, 1L)): _*))
    val b1 = t.systemBuckets.select("bucket").collect().map(_.getInt(0)).toSet
    assert(b1.max < 4 && b1.size > 1,
      s"initial-buckets=4 must seed multiple buckets on first write: $b1")
    // push way past target-row-num × max-buckets: growth stops at 6
    t.write(kvDf((5L to 40L).map(i => (i, s"v$i", i: java.lang.Long, 1L)): _*))
    val b2 = t.systemBuckets.select("bucket").collect().map(_.getInt(0)).toSet
    assert(b2.max < 6, s"max-buckets=6 must cap the range: $b2")
    assert(t.read.count() == 40)
  }

  test("changelog ignore-fields suppress pairs differing only in listed columns") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map(
        "changelog-producer.row-deduplicate-ignore-fields" -> "seq,n"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L)))
    // k=1 changes only in the ignored columns → NO -U/+U emitted;
    // k=2 changes v → full pair
    t.write(kvDf((1L, "a", 99L, 2L), (2L, "b2", 20L, 2L)))
    val chg = t.changelogBetween(0L, 1L)
      .select("k", "v", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(chg == Set((2L, "b", "-U"), (2L, "b2", "+U")), chg.toString)
  }

  test("commit.force-compact compacts after every write; commit.max-retries is honored") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map(
        "sequence.field" -> "seq",
        "commit.force-compact" -> "true",
        "commit.max-retries" -> "7"))
    assert(t.sm.commitMaxRetries == 7)
    t.write(kvDf((1L, "a", 10L, 1L)))
    t.write(kvDf((1L, "a2", 11L, 2L), (2L, "b", 20L, 1L)))
    val kinds = t.systemSnapshots.select("commit_kind").collect()
      .map(_.getString(0))
    assert(kinds.count(_ == "COMPACT") >= 2,
      s"each write must trigger a compaction: ${kinds.toSeq}")
    assert(t.read.orderBy("k").collect().map(_.getString(1)).toSeq
      == Seq("a2", "b"))
    // the COUNT fast path works immediately (level-1 files only)
    assert(t.countRowsFast().contains(2L))
  }

  test("snapshot.ignore-empty-commit: empty batches mint no history") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      options = Map("snapshot.ignore-empty-commit" -> "true"))
    val s1 = t.write(kvDf((1L, "a", 10L, 0L)))
    val s2 = t.write(kvDf()) // empty batch → no new snapshot
    assert(s2 == s1)
    assert(t.systemSnapshots.count() == 1)
    assert(t.read.count() == 1)
    // without the option an empty commit still creates a snapshot
    val c = GraftTable.create(spark, tmp(), kvSchema)
    c.write(kvDf((1L, "a", 10L, 0L)))
    c.write(kvDf())
    assert(c.systemSnapshots.count() == 2)
  }

  test("file.block-size parses and reaches the parquet writer") {
    assert(GraftTable.parseBytes("64kb") == 64L << 10)
    assert(GraftTable.parseBytes("128 MB") == 128L << 20)
    assert(GraftTable.parseBytes("1048576") == 1048576L)
    intercept[IllegalArgumentException](GraftTable.parseBytes("12 parsecs"))
    val t = GraftTable.create(spark, tmp(), kvSchema,
      options = Map("file.block-size" -> "1mb"))
    t.write(kvDf((1L, "a", 10L, 0L)))
    assert(t.read.count() == 1)
  }

  test("CDC write knobs: rowkind.field, ignore-delete, descending sequence") {
    val cdcSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("op", StringType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    def df(rows: (Long, String, String, Long)*) =
      spark.createDataFrame(
        rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, cdcSchema)
    // rowkind.field: the op column routes kinds
    val t = GraftTable.create(spark, tmp(), cdcSchema,
      primaryKeys = Seq("k"), options = Map(
        "rowkind.field" -> "op", "sequence.field" -> "seq"))
    t.write(df((1L, "a", "+I", 1L), (2L, "b", "+I", 1L)))
    t.write(df((1L, "a2", "+U", 2L), (2L, null, "-D", 2L)))
    assert(t.read.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a2")))
    // ignore-delete: -D and -U retractions never reach the table
    val t2 = GraftTable.create(spark, tmp(), cdcSchema,
      primaryKeys = Seq("k"), options = Map(
        "rowkind.field" -> "op", "sequence.field" -> "seq",
        "ignore-delete" -> "true"))
    t2.write(df((1L, "a", "+I", 1L)))
    t2.write(df((1L, null, "-D", 2L), (2L, "b", "+I", 2L)))
    assert(t2.read.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "a"), (2L, "b")))
    // descending sequence: the SMALLEST seq wins the merge — and the
    // point lookup must agree with the scan
    val t3 = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map(
        "sequence.field" -> "seq",
        "sequence.field.sort-order" -> "descending"))
    t3.write(kvDf((1L, "late", 10L, 5L)))
    t3.write(kvDf((1L, "early", 11L, 3L))) // smaller seq → wins
    assert(t3.read.head.getString(1) == "early")
    assert(t3.lookup(Map("k" -> 1L)).head.getString(1) == "early")
    t3.write(kvDf((1L, "later", 12L, 9L))) // larger seq → loses
    assert(t3.read.head.getString(1) == "early")
    assert(t3.lookup(Map("k" -> 1L)).head.getString(1) == "early")
    // domain edge: Long.MinValue is the SMALLEST seq and must win
    // (arithmetic negation would map it to itself and lose; the merge
    // inverts via bitwise NOT, agreeing with localLookup's ord.reverse)
    t3.write(kvDf((1L, "minval", 13L, Long.MinValue)))
    t3.write(kvDf((1L, "other", 14L, Long.MinValue + 1)))
    assert(t3.read.head.getString(1) == "minval")
    assert(t3.lookup(Map("k" -> 1L)).head.getString(1) == "minval")
    // an UNPAIRED -U winner is a retraction: the key is gone from
    // reads, lookups, and stays gone through compaction
    val t4 = GraftTable.create(spark, tmp(), cdcSchema,
      primaryKeys = Seq("k"), options = Map(
        "rowkind.field" -> "op", "sequence.field" -> "seq"))
    t4.write(df((1L, "a", "+I", 1L), (2L, "b", "+I", 1L)))
    t4.write(df((1L, "a", "-U", 2L))) // pk-changing update: +U went elsewhere
    assert(t4.read.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(t4.lookup(Map("k" -> 1L)).isEmpty)
    t4.compact()
    assert(t4.read.collect().map(_.getLong(0)).toSeq == Seq(2L),
      "compaction must not resurrect a -U-retracted key")
  }

  test("first-row merge engine keeps earliest record") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"),
      options = Map("merge-engine" -> "first-row", "sequence.field" -> "seq"))
    t.write(kvDf((1L, "first", 1L, 1L)))
    t.write(kvDf((1L, "second", 2L, 2L)))
    assert(t.read.head.getString(1) == "first")
  }

  test("commit identifier is idempotent (streaming epoch replay)") {
    val t = GraftTable.create(spark, tmp(), kvSchema)
    val s1 = t.write(kvDf((1L, "a", 10L, 0L)), commitIdentifier = 7L)
    val s2 = t.write(kvDf((1L, "a", 10L, 0L)), commitIdentifier = 7L)
    assert(s1 == s2)
    assert(t.read.count() == 1)
  }

  test("metadata-only delete drops whole partitions without opening files") {
    val sch = StructType(Seq(
      StructField("p", StringType, nullable = false),
      StructField("k", LongType, nullable = false)))
    def df(rows: (String, Long)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch)
    val t = GraftTable.create(spark, tmp(), sch, partitionKeys = Seq("p"))
    t.write(df(("a", 1L), ("b", 2L), ("c", 3L)))
    val filesBefore = t.systemFiles.select("file_name").collect().map(_.getString(0)).toSet
    t.delete(col("p") === "b")
    assert(t.read.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "c"))
    // surviving files are the SAME physical files (no rewrite happened)
    val filesAfter = t.systemFiles.select("file_name").collect().map(_.getString(0)).toSet
    assert(filesAfter.subsetOf(filesBefore))
    // non-partition predicate still takes the rewrite path
    t.delete(col("k") === 1L)
    assert(t.read.collect().map(_.getString(0)).toSeq == Seq("c"))
  }

  test("changelogBetween derives -U/+U/+I/-D pairs from two snapshots") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L), (4L, "d", 40L, 1L)))
    t.write(kvDf((1L, "a2", 11L, 2L), (3L, "c", 30L, 1L)))  // update k=1, insert k=3
    t.delete(col("k") === 4L)                                // delete k=4
    val chg = t.changelogBetween(0L, 2L)
      .select("k", "v", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(chg == Set(
      (1L, "a", "-U"), (1L, "a2", "+U"), (3L, "c", "+I"), (4L, "d", "-D")))
  }

  test("full-compaction producer persists changelog at compaction time") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq",
        "changelog-producer" -> "full-compaction", "bucket" -> "2"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L), (4L, "d", 40L, 1L)))
    t.compact() // first compaction: changelog = everything as +I
    t.write(kvDf((1L, "a2", 11L, 2L), (3L, "c", 30L, 1L)))
    t.delete(col("k") === 4L)
    // under this producer changes surface only at compactions — appends
    // alone contribute nothing to the changelog stream
    val sBeforeCompact = t.systemSnapshots.count() - 1
    assert(t.incrementalRead(1L, sBeforeCompact).count() == 0)
    val cid = t.compact().get
    val df = t.incrementalRead(cid - 1, cid)
    // the pairs come from persisted changelog files: no state-diff join
    // may appear in the read plan
    assert(!df.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join]),
      "read must serve persisted changelog, not re-derive a state diff")
    val rows = df.select("k", "v", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      (1L, "a", "-U"), (1L, "a2", "+U"), (3L, "c", "+I"), (4L, "d", "-D")))
    // a whole-history read equals first-compaction inserts + the diff
    val all = t.incrementalRead(0L, cid).select("k", "_row_kind").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(all.contains((2L, "+I")) && all.contains((1L, "+I")) &&
      all.contains((1L, "-U")) && all.contains((1L, "+U")))
  }

  test("binlog packs -U/+U pairs into single rows with [before, after] arrays") {
    val t = GraftTable.create(spark, tmp(), kvSchema,
      primaryKeys = Seq("k"), options = Map("sequence.field" -> "seq",
        "changelog-producer" -> "lookup", "bucket" -> "2"))
    t.write(kvDf((1L, "a", 10L, 1L), (2L, "b", 20L, 1L)))
    t.write(kvDf((1L, "a2", 11L, 2L), (3L, "c", 30L, 1L)))
    t.delete(col("k") === 2L)
    val rows = t.binlog(0L, 2L)
      .select("snapshot_id", "rowkind", "k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getSeq[String](3).toList)).toSet
    assert(rows == Set(
      (1L, "+U", 1L, List("a", "a2")),
      (1L, "+I", 3L, List("c")),
      (2L, "-D", 2L, List("b"))))
  }

  test("snapshots and files system tables report metadata") {
    val t = GraftTable.create(spark, tmp(), kvSchema)
    t.write(kvDf((1L, "a", 10L, 0L)))
    t.overwrite(kvDf((2L, "b", 20L, 0L)))
    val kinds = t.systemSnapshots.select("commit_kind").collect().map(_.getString(0))
    assert(kinds.toSeq == Seq("APPEND", "OVERWRITE"))
    assert(t.systemFiles.select(sum("row_count")).head.getLong(0) == 1L)
  }
}
