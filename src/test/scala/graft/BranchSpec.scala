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
}
