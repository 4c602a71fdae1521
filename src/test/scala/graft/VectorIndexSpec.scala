package graft

import graft.operators.Similarity
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Table-attached HNSW vector index (reference: paimon-faiss persisted
  * global vector indexes + CreateGlobalIndexProcedure): sidecar under
  * index-hnsw/, stamped by snapshot id; stale stamps fall back to an
  * in-memory sharded build over CURRENT data so search never serves
  * deleted/old vectors or misses new ones. */
class VectorIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-vec").toString + "/t"

  private def emb(ids: Range): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(7)
    ids.map { i =>
      val base = if (i % 2 == 0) Array(1.0, 0.05 * (i % 13)) else Array(-1.0, 0.05 * (i % 11))
      (i.toLong, base.map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("fresh index serves the probe; results match the operator path") {
    val t = GraftTable.create(spark, tmp(), emb(0 until 1).schema)
    t.write(emb(0 until 200))
    t.rebuildVectorIndex("vec_id", "embedding", shards = 3)
    val q = t.read.filter(col("vec_id") < 4)
    val got = t.vectorSearch("vec_id", "embedding", q, kNeighbors = 5)
    val direct = Similarity.hnswTopK(t.read, q, "vec_id", "embedding",
      kNeighbors = 5, shards = 3)
    assert(got.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq)
    // served from the sidecar: only leaf is the graphs parquet
    val leaves = got.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1 && leaves.head.output.map(_.name).contains("graph"))
  }

  test("stale index is never probed: new vectors surface via fallback") {
    val t = GraftTable.create(spark, tmp(), emb(0 until 1).schema)
    t.write(emb(0 until 100))
    t.rebuildVectorIndex("vec_id", "embedding", shards = 3)
    // a new vector nearly identical to query 0 — must become its top hit
    import spark.implicits._
    val q0 = emb(0 until 1).collect()(0).getSeq[Float](1).toArray
    t.write(Seq((9999L, q0.map(x => x * 2.0f))).toDF("vec_id", "embedding"))
    val got = t.vectorSearch("vec_id", "embedding", t.read.filter(col("vec_id") === 0L))
    val top = got.orderBy(col("rank")).head
    assert(top.getLong(1) == 9999L, s"stale index served: $top")
    // rebuild re-freshens the sidecar path
    t.rebuildVectorIndex("vec_id", "embedding", shards = 3)
    val again = t.vectorSearch("vec_id", "embedding", t.read.filter(col("vec_id") === 0L))
    assert(again.orderBy(col("rank")).head.getLong(1) == 9999L)
    val leaves = again.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1 && leaves.head.output.map(_.name).contains("graph"))
  }

  test("SQL surface: CALL sys.rebuild_vector_index") {
    val wh = Files.createTempDirectory("graft-vec-wh").toString
    spark.conf.set("spark.sql.catalog.graft_vec", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_vec.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_vec.db")
    spark.sql("CREATE TABLE graft_vec.db.t (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    emb(0 until 50).write.insertInto("graft_vec.db.t")
    val res = spark.sql(
      "CALL graft_vec.sys.rebuild_vector_index('db.t', 'vec_id', 'embedding')")
      .head.getString(0)
    assert(res.contains("vector index"), res)
    val t = GraftTable.load(spark, s"$wh/db/t")
    val got = t.vectorSearch("vec_id", "embedding",
      t.read.filter(col("vec_id") === 0L), kNeighbors = 3)
    assert(got.count() == 3)
  }
}
