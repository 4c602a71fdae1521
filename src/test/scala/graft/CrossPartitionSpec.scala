package graft

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Global cross-partition upsert index: PK tables partitioned OUTSIDE
  * the primary key keep partition pruning because writes retract moved
  * keys from their old partition (reference: paimon-core
  * .../crosspartition/GlobalIndexAssigner.java:79, IndexBootstrap). */
class CrossPartitionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-xpart").toString + "/t"

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("v", DoubleType, nullable = true),
    StructField("seq", LongType, nullable = true)))

  private def df(rows: (Long, String, Double, Long)*) =
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4)).asJava, sch).coalesce(1)

  private def mk(extra: Map[String, String] = Map.empty): GraftTable =
    GraftTable.create(spark, tmp(), sch,
      partitionKeys = Seq("status"), primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "bucket" -> "2") ++ extra)

  test("moved keys are retracted from their old partition") {
    val t = mk()
    t.write(df((1L to 10L).map(k => (k, "A", k.toDouble, 1L)): _*))
    // move keys 1-3 to B, insert 11 in B
    t.write(df((1L, "B", 101.0, 2L), (2L, "B", 102.0, 2L),
      (3L, "B", 103.0, 2L), (11L, "B", 11.0, 1L)))
    // global state: one row per key, movers live in B
    val all = t.read.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all.size == 11)
    assert(Seq(1L, 2L, 3L, 11L).forall(all(_) == "B"))
    assert((4L to 10L).forall(all(_) == "A"))
    // partition-local reads are self-contained: movers are GONE from A
    val aKeys = t.scan(col("status") === "A").collect().map(_.getLong(0)).toSet
    assert(aKeys == (4L to 10L).toSet)
    val bKeys = t.scan(col("status") === "B").collect().map(_.getLong(0)).toSet
    assert(bKeys == Set(1L, 2L, 3L, 11L))
    // values of movers come from the new write
    assert(t.read.filter(col("k") === 1L).head.getDouble(2) == 101.0)
  }

  test("routing join vetoes broadcast by manifest bytes for a wide index") {
    // the same manifest-bytes policy as the streaming lookup join:
    // under the threshold the index side broadcasts, over it the join
    // pins sort-merge (an AQE mis-broadcast of a billion-key index
    // would OOM at scale)
    val t = mk(Map("join.broadcast-max-bytes" -> "1")) // everything is "wide"
    t.write(df((1L to 10L).map(k => (k, "A", k.toDouble, 1L)): _*))
    GraftTable.joinGateDecisions.clear()
    t.write(df((1L, "B", 101.0, 2L), (11L, "B", 11.0, 1L)))
    val shuffled = GraftTable.joinGateDecisions.asScala
      .filter(_._1 == "cross-partition-routing").toSeq
    assert(shuffled.nonEmpty && shuffled.forall(!_._3),
      s"a wide index slice must not broadcast: $shuffled")
    // and the move is still correct through the sort-merge path
    val all = t.read.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) == "B" && all(11L) == "B" && all(2L) == "A")

    // default threshold: the tiny index broadcasts
    val t2 = mk()
    t2.write(df((1L to 5L).map(k => (k, "A", k.toDouble, 1L)): _*))
    GraftTable.joinGateDecisions.clear()
    t2.write(df((1L, "B", 9.0, 2L)))
    val bc = GraftTable.joinGateDecisions.asScala
      .filter(_._1 == "cross-partition-routing").toSeq
    assert(bc.nonEmpty && bc.forall(_._3), s"small index should broadcast: $bc")
  }

  test("partition predicates prune files again (the index makes it safe)") {
    val t = mk()
    t.write(df((1L to 6L).map(k => (k, "A", k.toDouble, 1L)): _*))
    t.write(df((1L, "B", 100.0, 2L), (7L, "B", 7.0, 1L)))
    val total = t.planEntries(lit(true)).size
    val bOnly = t.planEntries(col("status") === "B")
    assert(bOnly.nonEmpty && bOnly.size < total,
      s"partition predicate should prune: ${bOnly.size} of $total")
    assert(bOnly.forall(_.partition.get("status").contains("B")))
    // pruned read answers correctly despite the key having history in A
    assert(t.scan(col("status") === "B").collect()
      .map(_.getLong(0)).toSet == Set(1L, 7L))
  }

  test("compaction drops retraction tombstones; state survives") {
    val t = mk()
    t.write(df((1L to 5L).map(k => (k, "A", k.toDouble, 1L)): _*))
    t.write(df((1L, "B", 100.0, 2L)))
    t.compact()
    val all = t.read.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all.size == 5 && all(1L) == "B" && (2L to 5L).forall(all(_) == "A"))
    assert(t.scan(col("status") === "A").collect()
      .map(_.getLong(0)).toSet == (2L to 5L).toSet)
    // index survives compaction and still answers
    val idx = t.globalIndexDf.get.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(idx(1L) == "B")
  }

  test("multi-hop moves and deletes keep every partition consistent") {
    val t = mk()
    t.write(df((1L, "A", 1.0, 1L), (2L, "A", 2.0, 1L)))
    t.write(df((1L, "B", 10.0, 2L)))
    t.write(df((1L, "C", 20.0, 3L))) // second move: B must be retracted too
    assert(t.scan(col("status") === "A").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(t.scan(col("status") === "B").count() == 0)
    assert(t.scan(col("status") === "C").collect().map(_.getLong(0)).toSeq == Seq(1L))
    t.delete(col("k") === 1L)
    assert(t.read.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // re-insert in a fresh partition after delete
    t.write(df((1L, "D", 30.0, 4L)))
    val all = t.read.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all == Map(1L -> "D", 2L -> "A"))
    assert(t.scan(col("status") === "C").count() == 0)
  }

  test("index sidecars compact past the trigger") {
    val t = mk(Map("global-index.compact-trigger" -> "4"))
    (1L to 6L).foreach { i =>
      t.write(df((i, if (i % 2 == 0) "A" else "B", i.toDouble, i)))
    }
    val files = t.sm.latestSnapshot().get.globalIndex.get
    assert(files.size < 6, s"index should have been folded, got ${files.size}")
    val idx = t.globalIndexDf.get.collect()
    assert(idx.length == 6)
  }
}
