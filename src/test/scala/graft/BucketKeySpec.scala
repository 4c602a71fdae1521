package graft

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** `bucket-key` distribution (reference: CoreOptions.BUCKET_KEY +
  * SchemaValidation "Primary key constraint should include all bucket
  * keys"): explicit bucket columns for PK tables (subset of the key)
  * and bucketed-append tables (keyless). Every consumer of the bucket
  * hash — writer routing, equality pruning, point lookup, shard
  * routing — must agree on the bucket-key columns. */
class BucketKeySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-bk").toString + "/t"

  private val sch = StructType(Seq(
    StructField("region", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = true)))

  private def df(rows: (String, Long, Double)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, sch)

  test("create-time validation: unknown column, not-in-pk, non-fixed buckets") {
    assertThrows[IllegalArgumentException] {
      GraftTable.create(spark, tmp(), sch, options = Map("bucket-key" -> "nope"))
    }
    assertThrows[IllegalArgumentException] {
      GraftTable.create(spark, tmp(), sch,
        primaryKeys = Seq("id"), options = Map("bucket-key" -> "region"))
    }
    assertThrows[IllegalArgumentException] {
      GraftTable.create(spark, tmp(), sch,
        primaryKeys = Seq("region", "id"),
        options = Map("bucket-key" -> "region", "bucket" -> "-1"))
    }
  }

  test("PK table with bucket-key ⊂ pk: co-located writes, subset-equality " +
    "pruning, merged reads and point lookups stay exact") {
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("region", "id"),
      options = Map("bucket-key" -> "region", "bucket" -> "4"))
    val regions = Seq("ap", "eu", "na", "sa", "af")
    t.write(df(regions.flatMap(r => (0L until 20L).map(i => (r, i, 1.0))): _*))
    t.write(df(regions.map(r => (r, 3L, 9.9)): _*)) // upsert one key per region
    // every row of one region lands in exactly ONE bucket
    val entries = t.sm.latestSnapshot().map(t.sm.liveEntries).get
    regions.foreach { r =>
      val buckets = t.readRaw(entries)
        .filter(col("region") === r).select("__bucket")
        .distinct().collect().map(_.getInt(0)).toSet
      assert(buckets.size == 1, s"region $r spread over $buckets")
      // the driver-side hash agrees with what the writer laid down
      assert(t.pkBucketFor(Map("region" -> r, "id" -> 0L)).contains(buckets.head))
    }
    // merged read is exact (merge keys remain the full pk)
    assert(t.read.count() == 100L)
    assert(t.read.filter(col("id") === 3L && col("region") === "eu")
      .head.getDouble(2) == 9.9)
    // equality on the BUCKET KEY ALONE prunes to one bucket's files —
    // the full-pk requirement would have read everything
    val all = t.scan(lit(true)).inputFiles.length
    val one = t.scan(col("region") === "eu").inputFiles.length
    assert(one < all, s"no bucket pruning: $one vs $all files")
    assert(t.scan(col("region") === "eu").count() == 20L)
    // point lookup through the bucket-key hash
    assert(t.localLookup(Map("region" -> "eu", "id" -> 3L))
      .map(_.getDouble(2)) == Seq(9.9))
  }

  test("bucketed-append table: routed writes, bucket pruning, reads exact, " +
    "SPJ join between identically-bucketed tables runs without a shuffle") {
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map("bucket-key" -> "id", "bucket" -> "4"))
    t.write(df((0L until 40L).map(i => (s"r${i % 3}", i, i * 1.0)): _*))
    t.write(df((40L until 60L).map(i => (s"r${i % 3}", i, i * 1.0)): _*))
    val entries = t.sm.latestSnapshot().map(t.sm.liveEntries).get
    assert(entries.map(_.bucket).distinct.sorted == Seq(0, 1, 2, 3),
      s"buckets: ${entries.map(_.bucket).distinct.sorted}")
    // reads return exactly the input (no __bucket leakage, no loss)
    assert(t.read.columns.toSeq == sch.fieldNames.toSeq)
    assert(t.read.count() == 60L)
    assert(t.read.select(sum(col("v"))).head.getDouble(0) == (0 until 60).sum.toDouble)
    // equality on the bucket key opens one bucket's files
    val all = t.scan(lit(true)).inputFiles.length
    val one = t.scan(col("id") === 7L).inputFiles.length
    assert(one < all, s"no bucket pruning: $one vs $all")
    assert(t.scan(col("id") === 7L).collect().map(_.getLong(1)).toSeq == Seq(7L))
    // storage-partitioned join: two identically-bucketed append tables
    // joined on the bucket key — no ShuffleExchange on either side
    val wh = Files.createTempDirectory("graft-bk-wh").toString
    spark.conf.set("spark.sql.catalog.graft_bk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_bk.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bk.db")
    Seq("a", "b").foreach { n =>
      spark.sql(s"""CREATE TABLE graft_bk.db.$n (id BIGINT, v DOUBLE)
                   |TBLPROPERTIES ('bucket-key'='id', 'bucket'='4')""".stripMargin)
      spark.sql(s"INSERT INTO graft_bk.db.$n " +
        "SELECT id, CAST(id AS DOUBLE) FROM range(100)")
    }
    val joined = spark.sql(
      """SELECT a.id, a.v + b.v AS s FROM graft_bk.db.a a
        |JOIN graft_bk.db.b b ON a.id = b.id""".stripMargin)
    assert(joined.count() == 100L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed append join still shuffles:\n$plan")
    // SQL row-level ops (ReplaceData staging) must re-route rewritten
    // rows too — a pruned point read after UPDATE/DELETE stays exact
    spark.sql("UPDATE graft_bk.db.a SET v = 123.5 WHERE id = 5")
    assert(spark.sql("SELECT v FROM graft_bk.db.a WHERE id = 5")
      .head.getDouble(0) == 123.5)
    spark.sql("DELETE FROM graft_bk.db.a WHERE id = 6")
    assert(spark.sql("SELECT count(*) FROM graft_bk.db.a WHERE id = 6")
      .head.getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) FROM graft_bk.db.a").head.getLong(0) == 99L)
    val ta = graft.table.GraftTable.load(spark, s"$wh/db/a")
    assert(ta.scan(col("id") === 5L).collect().map(_.getDouble(1)).toSeq ==
      Seq(123.5), "library-pruned read agrees after SQL rewrite")
  }

  test("bucket narrowing never prunes files written under an OLDER bucket " +
    "layout: an interrupted rescale keeps point reads exact") {
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("region", "id"), options = Map("bucket" -> "2"))
    t.write(df((0L until 20L).map(i => (s"r${i % 3}", i, i * 1.0)): _*))
    // simulate a rescale whose compact never landed: new schema says 8
    // buckets, every live file was hashed under 2
    val sch0 = t.schema
    t.sm.writeSchema(sch0.copy(id = sch0.id + 1,
      options = sch0.options.updated("bucket", "8")))
    val t2 = GraftTable.load(spark, t.path)
    (0L until 20L).foreach { i =>
      val got = t2.scan(col("region") === s"r${i % 3}" && col("id") === i)
        .collect().map(_.getDouble(2)).toSeq
      assert(got == Seq(i * 1.0), s"id $i lost under stale-layout narrowing")
    }
    // point lookups agree
    assert(t2.localLookup(Map("region" -> "r1", "id" -> 1L))
      .map(_.getDouble(2)) == Seq(1.0))
    // after the compact lands, files carry the new layout and
    // narrowing engages again
    t2.compact()
    val all = t2.scan(org.apache.spark.sql.functions.lit(true)).inputFiles.length
    val one = t2.scan(col("region") === "r1" && col("id") === 1L).inputFiles.length
    assert(one < all, s"narrowing dead after compact: $one vs $all")
    assert(t2.read.count() == 20L)
  }

  test("bucketed-append DML re-routes rewritten rows to their buckets — " +
    "pruned point reads still find updated rows after COW, DV and sort-compact") {
    // COW rewrite path (no DVs)
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map("bucket-key" -> "id", "bucket" -> "4"))
    t.write(df((0L until 40L).map(i => (s"r${i % 3}", i, i * 1.0)): _*))
    t.update(Map("v" -> lit(777.0)), col("id") === 7L)
    t.delete(col("id") === 8L)
    val hit = t.scan(col("id") === 7L)
    assert(hit.inputFiles.length < t.scan(lit(true)).inputFiles.length,
      "pruning must still engage after the rewrite")
    assert(hit.collect().map(_.getDouble(2)).toSeq == Seq(777.0),
      "rewritten row must live in its hash bucket, not bucket 0")
    assert(t.scan(col("id") === 8L).count() == 0)
    assert(t.read.count() == 39L)
    // DV path: updated rows appended as NEW files must route too
    val d = GraftTable.create(spark, tmp(), sch,
      options = Map("bucket-key" -> "id", "bucket" -> "4",
        "deletion-vectors.enabled" -> "true"))
    d.write(df((0L until 40L).map(i => (s"r${i % 3}", i, i * 1.0)): _*))
    d.update(Map("v" -> lit(888.0)), col("id") === 9L)
    assert(d.scan(col("id") === 9L).collect().map(_.getDouble(2)).toSeq == Seq(888.0))
    assert(d.read.count() == 40L)
    // sort-compact keeps the routing (clusters within buckets)
    assert(t.sortCompact("order", Seq("region")).isDefined)
    val entries = t.sm.latestSnapshot().map(t.sm.liveEntries).get
    assert(entries.map(_.bucket).distinct.forall(_ >= 0))
    assert(entries.map(_.bucket).distinct.size > 1, "buckets survived compact")
    assert(t.scan(col("id") === 7L).collect().map(_.getDouble(2)).toSeq == Seq(777.0))
    assert(t.scan(col("id") === 7L).inputFiles.length <
      t.scan(lit(true)).inputFiles.length)
  }
}
