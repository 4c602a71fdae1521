package graft

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Branch lifecycle: fork, independent evolution, fast-forward,
  * cross-branch GC safety. */
class BranchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-branch").toString + "/t"

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def df(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch)

  test("branch evolves independently of main; fast-forward adopts it") {
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df((1L, "base")))
    val b = t.createBranch("dev")
    assert(t.branches == Seq("dev"))
    // branch gains data main doesn't see
    b.write(df((2L, "branch-only")))
    assert(b.read.count() == 2)
    assert(t.read.count() == 1)
    // main gains data the branch doesn't see
    t.write(df((3L, "main-only")))
    assert(t.read.count() == 2)
    assert(b.read.count() == 2)
    // fast-forward: main adopts the branch history, divergent tail dropped
    t.fastForward("dev")
    val keys = t.read.collect().map(_.getLong(0)).sorted.toSeq
    assert(keys == Seq(1L, 2L))
    t.deleteBranch("dev")
    assert(t.branches.isEmpty)
    // adopted data files must still be readable after branch deletion
    assert(t.read.count() == 2)
  }

  test("scan.fallback-branch serves partitions missing on the current branch") {
    val psch = StructType(Seq(
      StructField("p", StringType, nullable = false),
      StructField("k", LongType, nullable = false)))
    def pdf(rows: (String, Long)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, psch)
    val t = GraftTable.create(spark, tmp(), psch, partitionKeys = Seq("p"))
    t.write(pdf(("a", 1L), ("b", 2L)))
    t.createBranch("legacy")
    // main moves on: partition b rewritten, partition c added, and the
    // OLD partition a dropped from main (it now lives only on legacy)
    t.overwrite(pdf(("b", 20L)))
    t.write(pdf(("c", 3L)))
    t.delete(col("p") === "a")
    assert(t.read.collect().map(_.getLong(1)).sorted.toSeq == Seq(3L, 20L))
    // with the fallback option, partition a is served from the branch;
    // main's partitions b and c always win
    t.setOption("scan.fallback-branch", "legacy")
    val t2 = GraftTable.load(spark, t.path)
    assert(t2.read.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 3L, 20L))
    // scans prune and filter across the union
    assert(t2.scan(col("p") === "a").collect().map(_.getLong(1)).toSeq == Seq(1L))
    assert(t2.scan(col("k") > 5L).collect().map(_.getLong(1)).toSeq == Seq(20L))
    // time travel stays pure main history (fallback is current-state only)
    // a bogus fallback branch is ignored, not an error
    t2.setOption("scan.fallback-branch", "nope")
    val t3 = GraftTable.load(spark, t.path)
    assert(t3.read.collect().map(_.getLong(1)).sorted.toSeq == Seq(3L, 20L))
  }

  test("fallback never serves a partition the current branch HAS but the filter pruned") {
    val psch = StructType(Seq(
      StructField("p", StringType, nullable = false),
      StructField("k", LongType, nullable = false)))
    def pdf(rows: (String, Long)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, psch)
    val t = GraftTable.create(spark, tmp(), psch, partitionKeys = Seq("p"))
    t.write(pdf(("b", 2L)))
    t.createBranch("legacy")
    // main REWRITES partition b: old k=2 replaced by k=20
    t.overwrite(pdf(("b", 20L)))
    t.setOption("scan.fallback-branch", "legacy")
    val t2 = GraftTable.load(spark, t.path)
    // k < 5 stats-prunes main's b file (min k=20) — but b EXISTS on
    // main, so the stale legacy row (b, 2) must NOT reappear
    assert(t2.scan(col("k") < 5L).count() == 0)
    assert(t2.read.filter(col("k") < 5L).count() == 0)
    // and the unfiltered union still serves main's version of b
    assert(t2.read.collect().map(_.getLong(1)).toSeq == Seq(20L))
  }

  test("expiration on main never collects files a branch references") {
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df((1L, "a")))
    t.createBranch("keepme")
    // churn main far past the branch point
    (2 to 6).foreach(i => t.overwrite(df((i.toLong, s"v$i"))))
    t.expireSnapshots(retain = 1)
    // branch still reads its forked state
    assert(t.branchTable("keepme").read.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
  }

  test("chain table: snapshot-branch partitions serve as-is, delta-only " +
    "partitions reconstruct from the latest earlier snapshot + chained deltas") {
    val csch = StructType(Seq(
      StructField("dt", StringType, nullable = false),
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    def cdf(rows: (String, Long, String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, csch)
    val t = GraftTable.create(spark, tmp(), csch,
      partitionKeys = Seq("dt"), primaryKeys = Seq("dt", "k"),
      options = Map(
        "sequence.field" -> "seq",
        "chain-table.enabled" -> "true",
        "scan.fallback-snapshot-branch" -> "snap",
        "scan.fallback-delta-branch" -> "delta"))
    val snap = t.createBranch("snap")
    val delta = t.createBranch("delta")
    // day 1 full state on the snapshot branch
    snap.write(cdf(("d1", 1L, "a", 1L), ("d1", 2L, "b", 1L)))
    // day 2 delta: update k=1, insert k=3
    delta.write(cdf(("d2", 1L, "a2", 2L), ("d2", 3L, "c", 2L)))
    // day 3 delta: delete k=2, insert k=4
    delta.writeKinded(cdf(("d3", 2L, "b", 3L)).withColumn(
      graft.core.Meta.KindCol, lit(graft.core.Meta.KindDelete).cast("byte")))
    delta.write(cdf(("d3", 4L, "d", 3L)))
    val got = t.read.select("dt", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val expected = Set(
      // d1: snapshot branch as-is
      ("d1", 1L, "a"), ("d1", 2L, "b"),
      // d2 reconstructed: d1 base + d2 delta, rows re-labeled d2
      ("d2", 1L, "a2"), ("d2", 2L, "b"), ("d2", 3L, "c"),
      // d3 reconstructed: d1 base + d2 + d3 deltas (k=2 deleted)
      ("d3", 1L, "a2"), ("d3", 3L, "c"), ("d3", 4L, "d"))
    assert(got == expected, s"got $got")
    // a NEW snapshot partition takes over: d2 published to snap branch
    snap.write(cdf(("d2", 1L, "a2" , 5L), ("d2", 3L, "c", 5L)))
    val got2 = t.read.filter(col("dt") === "d3").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // d3 now chains from snapshot d2 (k=2 never resurfaces, base is d2)
    assert(got2 == Set((1L, "a2"), (3L, "c"), (4L, "d")), s"got2 $got2")
    // d2 itself now serves as-is from the snapshot branch
    val got3 = t.read.filter(col("dt") === "d2").count()
    assert(got3 == 2L)
  }

  test("chain table plan stays O(1) in delta-only partitions: 50 un-snapshotted " +
    "partitions compile to one merge aggregate, not a union of 50 subtrees") {
    val csch = StructType(Seq(
      StructField("dt", IntegerType, nullable = false),
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), csch,
      partitionKeys = Seq("dt"), primaryKeys = Seq("dt", "k"),
      options = Map(
        "sequence.field" -> "seq",
        "chain-table.enabled" -> "true",
        "scan.fallback-snapshot-branch" -> "snap",
        "scan.fallback-delta-branch" -> "delta"))
    val snap = t.createBranch("snap")
    val delta = t.createBranch("delta")
    // one snapshot day, then 50 delta days in a stalled-snapshot-job
    // shape: day d upserts key (d % 7) to value d
    snap.write(spark.createDataFrame(
      (1L to 7L).map(k => Row(0, k, 0L, 0L)).asJava, csch))
    val deltaRows = (1 to 50).map(d => Row(d, (d % 7 + 1).toLong, d.toLong, d.toLong))
    delta.write(spark.createDataFrame(deltaRows.asJava, csch))
    val read = t.read
    // ONE merge: a single Aggregate in the optimized plan (the old
    // shape carried one per reconstructed partition = 51)
    val aggs = read.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one merge aggregate, got ${aggs.size}")
    // and at most the two branch scans feed it
    val scans = read.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      case r: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        if r.children.isEmpty => r
    }
    assert(scans.size <= 4, s"expected O(1) scan legs, got ${scans.size}")
    // correctness: day d serves the snapshot base overlaid with every
    // delta day <= d (newest per key wins)
    val got = read.filter(col("dt") === 50).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    val expect = (1L to 7L).map { k =>
      val lastDay = (1 to 50).filter(d => (d % 7 + 1).toLong == k).maxOption
      k -> lastDay.map(_.toLong).getOrElse(0L)
    }.toMap
    assert(got == expect, s"got $got")
    assert(read.count() == 7L * 51, "every day serves all 7 keys")
    // partition pruning happens at EDGE-BUILDING time: a day-1 query
    // scans day 1's chain only (snapshot base + the day-1 delta) —
    // day 50's chain spans everything by construction, but day 1 must
    // not pay for the other 49 days
    val pruned = t.scan(col("dt") === 1)
    assert(pruned.count() == 7L)
    val allFiles = read.inputFiles.length
    val oneDay = pruned.inputFiles.length
    assert(oneDay < allFiles,
      s"chain scan did not prune: $oneDay vs $allFiles files")
    // a mixed filter (partition conjunct AND data conjunct) still
    // prunes by the partition half and filters exactly: day 1 = base
    // zeros overlaid with key 2 -> 1
    val mixed = t.scan(col("dt") === 1 && col("v") > 0L)
    assert(mixed.inputFiles.length < allFiles)
    assert(mixed.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((2L, 1L)))
  }

  test("chain table edge building scales to ~500 delta-only partitions " +
    "(hoisted sort + binary search, single merge plan)") {
    val csch = StructType(Seq(
      StructField("dt", IntegerType, nullable = false),
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), csch,
      partitionKeys = Seq("dt"), primaryKeys = Seq("dt", "k"),
      options = Map(
        "sequence.field" -> "seq",
        "chain-table.enabled" -> "true",
        "scan.fallback-snapshot-branch" -> "snap",
        "scan.fallback-delta-branch" -> "delta"))
    val snap = t.createBranch("snap")
    val delta = t.createBranch("delta")
    val n = 500
    snap.write(spark.createDataFrame(
      Seq(Row(0, 1L, 0L, 0L)).asJava, csch))
    // 500 delta days, one row each: day d upserts key 1 to value d
    delta.write(spark.createDataFrame(
      (1 to n).map(d => Row(d, 1L, d.toLong, d.toLong)).asJava, csch))
    val read = t.read
    // the plan must stay ONE merge aggregate regardless of target count
    val aggs = read.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one merge aggregate, got ${aggs.size}")
    // every day serves key 1 at its own chained value — the full edge
    // set here is n·(n+1)/2 (each day chains all earlier deltas), so a
    // per-target rescan of the delta entries would be O(n²) twice over
    val got = read.select("dt", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got.size == n + 1)
    assert(got(0) == 0L && got(1) == 1L && got(n / 2) == (n / 2).toLong &&
      got(n) == n.toLong, s"sample: ${got.view.filterKeys(Set(0, 1, n / 2, n)).toMap}")
    // partition pruning at edge-building time: one mid-range day scans
    // its own chain only, far fewer files than the full read
    val pruned = t.scan(col("dt") === 3)
    assert(pruned.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L)))
    assert(pruned.inputFiles.length <= 5,
      s"day-3 chain must scan ~4 files, got ${pruned.inputFiles.length}")
  }

  test("chain table with multi-column INT partitions orders typed-lexicographic") {
    val csch = StructType(Seq(
      StructField("y", IntegerType, nullable = false),
      StructField("m", IntegerType, nullable = false),
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    def cdf(rows: (Int, Int, Long, String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4, r._5)).asJava, csch)
    val t = GraftTable.create(spark, tmp(), csch,
      partitionKeys = Seq("y", "m"), primaryKeys = Seq("y", "m", "k"),
      options = Map(
        "sequence.field" -> "seq",
        "chain-table.enabled" -> "true",
        "scan.fallback-snapshot-branch" -> "snap",
        "scan.fallback-delta-branch" -> "delta"))
    val snap = t.createBranch("snap")
    val delta = t.createBranch("delta")
    // snapshot at (2024, 9); deltas at (2024, 10) and (2024, 12)
    // — string order would put (2024, 10) BEFORE (2024, 9)
    snap.write(cdf((2024, 9, 1L, "a", 1L)))
    delta.write(cdf((2024, 10, 1L, "a2", 2L), (2024, 10, 2L, "b", 2L)))
    delta.write(cdf((2024, 12, 2L, "b2", 3L)))
    val got = t.read.select("y", "m", "k", "v").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3))).toSet
    val expected = Set(
      (2024, 9, 1L, "a"),
      // (2024,10) chains from (2024,9): typed order, not "10" < "9"
      (2024, 10, 1L, "a2"), (2024, 10, 2L, "b"),
      (2024, 12, 1L, "a2"), (2024, 12, 2L, "b2"))
    assert(got == expected, s"got $got")
    // a disjoint-key chain table is rejected up front
    val bad = GraftTable.create(spark, tmp(), csch,
      partitionKeys = Seq("y", "m"), primaryKeys = Seq("y", "m", "k"),
      options = Map("chain-table.enabled" -> "true",
        "scan.fallback-snapshot-branch" -> "nope",
        "scan.fallback-delta-branch" -> "nope2"))
    assertThrows[IllegalArgumentException] { bad.read.count() } // missing branches
  }
}
