package graft

import graft.core._
import graft.core.Meta._
import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Binary (parquet) manifests + distributed manifest pruning — the
  * 100 TB planning path: the driver must not JSON-parse entries or
  * probe index sidecars sequentially (reference: ManifestFile.java
  * Avro manifests + parallel scan in SnapshotReaderImpl.java:85). */
class ManifestScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-mscale").toString + "/t"

  test("parquet manifest roundtrip preserves every field") {
    val entries = Seq(
      ManifestEntry("ADD", Map("dt" -> "2024-01-01", "region" -> "eu"), 3,
        DataFileMeta("data/a.parquet", 100, 10, 0, 5, 1,
          Map("k" -> ColStats(Some("1"), Some("9"), 2),
            "s" -> ColStats(None, None, 0)),
          indexFiles = Some(Map("k" -> "index/x.k.bloom")),
          dvFile = Some("index/y.dv"), dvCardinality = Some(4L), schemaId = 7)),
      ManifestEntry("DELETE", Map.empty, 0,
        DataFileMeta("data/b.parquet", 1, 1, 0, 0, 0, Map.empty)))
    val back = ManifestIO.decode(ManifestIO.encode(entries))
    assert(back == entries)
  }

  test("new tables write parquet manifests; json remains readable") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir,
      Seq((1L, "a")).toDF("k", "v").schema)
    t.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val manifests = Files.list(java.nio.file.Paths.get(dir, "manifest"))
      .iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(manifests)
      .asScala.map(_.getFileName.toString).toSeq
    assert(names.exists(n => n.startsWith("manifest-") && n.endsWith(".parquet")),
      s"expected parquet manifests, got $names")
    assert(t.read.count() == 2)
    // json format still selectable (debuggability escape hatch)
    val dir2 = tmp()
    val t2 = GraftTable.create(spark, dir2,
      Seq((1L, "a")).toDF("k", "v").schema,
      options = Map("manifest.format" -> "json"))
    t2.write(Seq((3L, "c")).toDF("k", "v"))
    assert(t2.read.count() == 1)
  }

  /** FileIO wrapper counting driver-side index-sidecar reads. */
  private final class CountingIO extends FileIO {
    private val inner = new LocalFileIO
    val sidecarReads = new AtomicInteger(0)
    override def readBytes(path: String): Array[Byte] = {
      if (path.endsWith(".bloom")) sidecarReads.incrementAndGet()
      inner.readBytes(path)
    }
    override def readString(p: String): String = inner.readString(p)
    override def writeString(p: String, c: String): Unit = inner.writeString(p, c)
    override def writeBytes(p: String, c: Array[Byte]): Unit = inner.writeBytes(p, c)
    override def tryCreateAtomic(p: String, c: String): Boolean = inner.tryCreateAtomic(p, c)
    override def exists(p: String): Boolean = inner.exists(p)
    override def mkdirs(p: String): Unit = inner.mkdirs(p)
    override def list(d: String): Seq[String] = inner.list(d)
    override def delete(p: String): Unit = inner.delete(p)
    override def rename(s: String, d: String): Unit = inner.rename(s, d)
  }

  test("10k-file planning runs distributed with zero driver sidecar reads") {
    val dir = tmp()
    val sch = StructType(Seq(StructField("k", LongType, nullable = false)))
    GraftTable.create(spark, dir, sch, options = Map(
      "manifest.distributed-prune.file-count" -> "100",
      // sidecars are consulted only for columns the option lists
      // (stale post-widen sidecars must fail open, so the option is
      // the source of truth)
      BloomIndex.OptionColumns -> "k"))
    val nFiles = 10000
    // every file claims the SAME k range (stats can't prune) but its
    // bloom sidecar holds exactly one key — only the index refutes
    val io = new LocalFileIO
    val entries = (0 until nFiles).map { i =>
      val bloom = BloomFilter.create(100, 0.001)
      bloom.putString(i.toString)
      val out = new ByteArrayOutputStream()
      bloom.writeTo(out)
      val rel = s"index/f$i.k.bloom"
      io.writeBytes(s"$dir/$rel", out.toByteArray)
      ManifestEntry("ADD", Map.empty, i % 4,
        DataFileMeta(s"data/f$i.parquet", 1000, 100, 0, 0, 0,
          Map("k" -> ColStats(Some("0"), Some(nFiles.toString), 0)),
          indexFiles = Some(Map("k" -> rel))))
    }
    new SnapshotManager(dir).commit(entries, "APPEND", schemaId = 0)

    val counter = new CountingIO
    val t = GraftTable.load(spark, dir, counter)
    val snap = new SnapshotManager(dir).latestSnapshot().get
    val kept = t.pruneEntries(snap, col("k") === 7L)
    // bloom refutation is approximate: the true file must survive and
    // false positives must stay near the configured fpp
    assert(kept.exists(_.file.fileName == "data/f7.parquet"))
    assert(kept.size <= 50,
      s"bloom should refute ~all of $nFiles files, kept ${kept.size}")
    assert(counter.sidecarReads.get() == 0,
      s"driver performed ${counter.sidecarReads.get()} sidecar reads; " +
        "distributed pruning must move them to executors")
    val kept2 = t.pruneEntries(snap, col("k").isin(3L, 9998L))
    assert(kept2.exists(_.file.fileName == "data/f3.parquet") &&
      kept2.exists(_.file.fileName == "data/f9998.parquet"))
    assert(kept2.size <= 100)
  }

  test("100k-entry manifests: planning stays seconds, driver memory bounded") {
    // stats-only entries (no sidecars): models a 100 TB table of
    // ~100k files where planning = manifest decode + stats pruning.
    // The manifest is parquet, decoded in one pass; pruning past the
    // threshold runs as a Spark job.
    val dir = tmp()
    val sch = StructType(Seq(StructField("k", LongType, nullable = false)))
    GraftTable.create(spark, dir, sch, options = Map(
      "manifest.distributed-prune.file-count" -> "2048"))
    val nFiles = 100000
    // contiguous disjoint ranges: k in [i*100, i*100+99] for file i
    val entries = (0 until nFiles).map { i =>
      ManifestEntry("ADD", Map.empty, i % 16,
        DataFileMeta(s"data/f$i.parquet", 1000, 100, 0, 0, 0,
          Map("k" -> ColStats(Some((i * 100L).toString),
            Some((i * 100L + 99).toString), 0))))
    }
    val sm = new SnapshotManager(dir)
    val tCommit0 = System.nanoTime()
    sm.commit(entries, "APPEND", schemaId = 0)
    val commitSecs = (System.nanoTime() - tCommit0) / 1e9

    val t = GraftTable.load(spark, dir)
    val snap = sm.latestSnapshot().get
    val tPlan0 = System.nanoTime()
    val kept = t.pruneEntries(snap, col("k") === 4200007L)
    val planSecs = (System.nanoTime() - tPlan0) / 1e9
    assert(kept.size == 1 && kept.head.file.fileName == "data/f42000.parquet")
    // a second plan (warm manifests) over a range predicate
    val tPlan1 = System.nanoTime()
    val keptRange = t.pruneEntries(snap,
      col("k") >= 1000000L && col("k") < 1010000L)
    val planSecs2 = (System.nanoTime() - tPlan1) / 1e9
    assert(keptRange.size == 100, s"got ${keptRange.size}")
    // planning must stay interactive at 100k files (generous CI bound;
    // typical local numbers land in BENCH_NOTES.md)
    assert(planSecs < 30 && planSecs2 < 30,
      f"planning too slow: $planSecs%.1fs / $planSecs2%.1fs")
    info(f"commit=$commitSecs%.2fs firstPlan=$planSecs%.2fs warmPlan=$planSecs2%.2fs")
  }

  test("secondary-index probes stay one bounded job at 200k indexed rows") {
    // the at-scale promise of the GSI: a point/range probe reads the
    // (cid, v)-sorted parquet index ONCE and returns only hit rows —
    // cost grows with HITS, not with table rows or file count
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("town", StringType, nullable = true)))
    val t = GraftTable.create(spark, tmp(), sch, options = Map(
      GraftTable.SecIndexColumns -> "k,town",
      "secondary-index.compact-trigger" -> "4"))
    // 4 commits x 50k rows; k unique, town ~5k distinct
    (0 until 4).foreach { c =>
      t.write(spark.range(c * 50000L, (c + 1) * 50000L).select(
        col("id").as("k"),
        concat(lit("town"), pmod(col("id"), lit(5000))).as("town")).coalesce(2))
    }
    val t0 = System.nanoTime()
    val hit = t.planEntries(col("k") === 123456L)
    val probeSecs = (System.nanoTime() - t0) / 1e9
    assert(hit.size == 1, s"expected 1 file, got ${hit.size}")
    // memoized second probe on the same snapshot: no new job
    val t1 = System.nanoTime()
    assert(t.planEntries(col("k") === 123456L).size == 1)
    val memoSecs = (System.nanoTime() - t1) / 1e9
    // string + range probes over the same index
    assert(t.planEntries(col("town") === "town4999").nonEmpty)
    assert(t.planEntries(col("k") >= 199990L && col("k") <= 199999L).size == 1)
    assert(t.scan(col("k") === 123456L).count() == 1)
    assert(probeSecs < 30, f"probe too slow: $probeSecs%.1fs")
    assert(memoSecs < 1.0, f"memoized probe re-ran the job: $memoSecs%.2fs")
    info(f"firstProbe=$probeSecs%.2fs memoProbe=$memoSecs%.3fs")
  }
}
