package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: ANN recall@k vs the brute-force oracle at DERIVED scale.
  *
  * The s03-s08 oracle gates hash-match a recall BOOLEAN on gate-sized
  * data — that proves determinism and a floor, not approximate-search
  * QUALITY at scale. This probe measures the real quantity: mean and
  * min recall@k over `nQueries` queries against `bruteForceTopK` on
  * the same (ScaleGen-derived) embeddings, for each ANN path with its
  * gate-pinned parameters. Results land in BENCH_NOTES.md.
  *
  * sbt 'Test/runMain graft.RecallProbe <dir-with-embeddings.parquet> [k] [nQueries]'
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 10
    val nQueries = if (args.length > 2) args(2).toInt else 100
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = emb.count()
    // deterministic query sample: the nQueries smallest ids
    val qIds = emb.select("vec_id").orderBy("vec_id")
      .limit(nQueries).collect().map(_.getLong(0)).toSet
    val q = emb.filter(col("vec_id").isInCollection(qIds)).cache()
    q.count()
    println(s"[recall] corpus=$n queries=${qIds.size} k=$k dir=$dir")

    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id")).cache()
    exact.count()

    def report(name: String, approx: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val hits = approx.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").count()
      val per = q.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("count"), lit(0L)).as("hits"))
        .collect().map(_.getLong(0).toDouble / k)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[recall] $name%-28s mean=${per.sum / per.length}%.4f " +
        f"min=${per.min}%.3f p10=${per.sorted.apply(per.length / 10)}%.3f " +
        f"(probe ${secs}%.1fs)")
    }

    // s03: IVF trained per query run, gate params nProbe=6 + the
    // quality/latency ladder
    Seq(6, 12, 24).foreach { np =>
      report(s"s03 ivfTopK nProbe=$np",
        Similarity.ivfTopK(emb, q, "vec_id", "embedding",
          dim = 64, kNeighbors = k, nProbe = np))
    }
    // s05: in-memory sharded HNSW, gate params
    report("s05 hnswTopK ef=48 m=8 sh=4",
      Similarity.hnswTopK(emb, q, "vec_id", "embedding",
        kNeighbors = k, shards = 4, m = 8, efConstruction = 64, efSearch = 48))
    // s06: persisted sharded HNSW, gate params
    val s06Dir = java.nio.file.Files
      .createTempDirectory("graft-recall-s06").toString + "/idx"
    Similarity.buildHnswIndex(emb, s06Dir, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    report("s06 hnswIndexTopK ef=48",
      Similarity.hnswIndexTopK(spark, s06Dir, q, "vec_id", "embedding",
        kNeighbors = k, efSearch = 48))
    // s06 at a raised efSearch: the quality/latency knob documented
    report("s06 hnswIndexTopK ef=128",
      Similarity.hnswIndexTopK(spark, s06Dir, q, "vec_id", "embedding",
        kNeighbors = k, efSearch = 128))
    // s08: half built + half appended, gate params
    val s08Dir = java.nio.file.Files
      .createTempDirectory("graft-recall-s08").toString + "/idx"
    Similarity.buildHnswIndex(emb.filter(col("vec_id") % 2 === 0), s08Dir,
      "vec_id", "embedding", shards = 4, m = 8, efConstruction = 64)
    Similarity.appendToHnswIndex(emb.filter(col("vec_id") % 2 === 1), s08Dir,
      "vec_id", "embedding", shards = 4, m = 8, efConstruction = 64)
    report("s08 append-grown ef=48",
      Similarity.hnswIndexTopK(spark, s08Dir, q, "vec_id", "embedding",
        kNeighbors = k, efSearch = 48))
    report("s08 append-grown ef=128",
      Similarity.hnswIndexTopK(spark, s08Dir, q, "vec_id", "embedding",
        kNeighbors = k, efSearch = 128))
    // build-side knob: a denser graph (m=16, efC=128) at search ef=64
    val s06bDir = java.nio.file.Files
      .createTempDirectory("graft-recall-s06b").toString + "/idx"
    Similarity.buildHnswIndex(emb, s06bDir, "vec_id", "embedding",
      shards = 4, m = 16, efConstruction = 128)
    report("hnsw m=16 efC=128 ef=64",
      Similarity.hnswIndexTopK(spark, s06bDir, q, "vec_id", "embedding",
        kNeighbors = k, efSearch = 64))

    spark.stop()
  }
}
