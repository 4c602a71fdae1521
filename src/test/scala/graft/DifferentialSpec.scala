package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Seeded randomized differential test: a long random op sequence
  * (upserts with out-of-order sequences, deletes, compactions) runs
  * against BOTH the table and an independent in-memory model of the
  * LSM merge semantics; every step the merged read must equal the
  * model, and time travel must reproduce recorded model states.
  * The reference validates its core the same way (TestFileStore's
  * randomized write → read-back-verify loops); fixed seeds keep runs
  * reproducible. */
class DifferentialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("seq", LongType, nullable = true)))

  private def df(rows: Seq[(Long, String, Long)]): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, sch)

  /** Model entry: Some(value,seq) = live row; None,seq = tombstone
    * (a later write resurrects only with userSeq >= tombstone seq —
    * equal seq loses the user-seq compare but wins the commit-seq
    * tiebreak, matching the (sequence.field, _graft_seq) ordering). */
  private type Model = scala.collection.mutable.Map[Long, (Option[String], Long)]

  private def liveOf(m: Model): Map[Long, (String, Long)] =
    m.collect { case (k, (Some(v), s)) => k -> (v, s) }.toMap

  for (seed <- Seq(7L, 42L, 20260814L))
    test(s"random upsert/delete/compact sequence matches the model (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val t = GraftTable.create(spark,
        Files.createTempDirectory("graft-diff").toString + "/t", sch,
        primaryKeys = Seq("k"),
        options = Map("sequence.field" -> "seq", "bucket" -> "2"))
      val model: Model = scala.collection.mutable.Map.empty
      val history = scala.collection.mutable.Map.empty[Long, Map[Long, (String, Long)]]
      var step = 0
      def check(): Unit = {
        val got = t.read.collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
        assert(got == liveOf(model), s"step $step diverged (seed $seed)")
      }
      (1 to 22).foreach { _ =>
        step += 1
        rnd.nextInt(10) match {
          case n if n < 6 => // upsert batch, ~30% late (older) sequences
            val rows = (0 until 1 + rnd.nextInt(6)).map { i =>
              val k = rnd.nextInt(12).toLong
              val late = rnd.nextInt(10) < 3 && step > 2
              val s = (if (late) step - 1 - rnd.nextInt(2) else step) * 100L + i
              (k, s"v$step-$i", s)
            }
            val snap = t.write(df(rows))
            rows.foreach { case (k, v, s) =>
              val keep = model.get(k) match {
                case Some((_, old)) => s >= old // equal: commit-seq tiebreak
                case None => true
              }
              if (keep) model(k) = (Some(v), s)
            }
            history(snap) = liveOf(model)
          case n if n < 8 => // delete one existing key (tombstone)
            liveOf(model).keys.toSeq.sorted.headOption.foreach { k =>
              val snap = t.delete(col("k") === k)
              model(k) = (None, model(k)._2)
              history(snap) = liveOf(model)
            }
          case _ => // full compaction folds history; tombstones drop
            t.compact()
            model.filterInPlace { case (_, (v, _)) => v.isDefined }
        }
        check()
      }
      // time travel reproduces each recorded model state
      history.foreach { case (snapId, expect) =>
        val got = t.versionAsOf(snapId).collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
        assert(got == expect, s"time travel to $snapId diverged (seed $seed)")
      }
    }

  for (seed <- Seq(11L, 77L))
    test(s"append table: random append/DV-delete/update/overwrite matches the model (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val asch = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", LongType, nullable = true)))
      def adf(rows: Seq[(Long, Long)]): DataFrame =
        spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, asch)
      val t = GraftTable.create(spark,
        Files.createTempDirectory("graft-diffa").toString + "/t", asch,
        options = Map("deletion-vectors.enabled" -> "true"))
      // model: id -> v (ids unique per append step)
      val model = scala.collection.mutable.Map.empty[Long, Long]
      val history = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
      var nextId = 0L
      var step = 0
      def check(): Unit = {
        val got = t.read.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == model.toMap, s"step $step diverged (seed $seed)")
      }
      (1 to 20).foreach { _ =>
        step += 1
        rnd.nextInt(10) match {
          case n if n < 5 => // append fresh ids
            val rows = (0 until 1 + rnd.nextInt(8)).map { _ =>
              val id = nextId; nextId += 1
              (id, rnd.nextInt(100).toLong)
            }
            val snap = t.write(adf(rows))
            rows.foreach { case (id, v) => model(id) = v }
            history(snap) = model.toMap
          case n if n < 7 && model.nonEmpty => // DV delete a value range
            val bound = rnd.nextInt(100).toLong
            val snap = t.delete(col("v") < bound)
            model.filterInPlace { case (_, v) => v >= bound }
            history(snap) = model.toMap
          case n if n < 9 && model.nonEmpty => // DV update a value range
            val bound = rnd.nextInt(100).toLong
            val snap = t.update(Map("v" -> (col("v") + 1000L)), col("v") < bound)
            model.mapValuesInPlace((_, v) => if (v < bound) v + 1000L else v)
            history(snap) = model.toMap
          case n if n == 9 => // full overwrite (unpartitioned: replace all)
            val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
              val id = nextId; nextId += 1
              (id, rnd.nextInt(100).toLong)
            }
            val snap = t.overwrite(adf(rows))
            model.clear()
            rows.foreach { case (id, v) => model(id) = v }
            history(snap) = model.toMap
          case _ => () // roll again next step
        }
        check()
      }
      history.foreach { case (snapId, expect) =>
        val got = t.versionAsOf(snapId).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expect, s"time travel to $snapId diverged (seed $seed)")
      }
    }
}
