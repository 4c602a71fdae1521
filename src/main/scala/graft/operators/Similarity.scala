package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths (mirrors the reference's `withVectorSearch` /
  * `VectorSearchTable` surface — paimon-common
  * .../predicate/VectorSearch.java:32 — rebuilt on DataFrames):
  *  - brute force: exact top-k via a broadcast of the (small) query
  *    set against the full corpus — one corpus scan, no corpus shuffle;
  *  - LSH (random hyperplane) buckets: approximate top-k touching only
  *    candidate buckets — the 100 TB path, where scanning the full
  *    corpus per query set is not viable.
  *
  * All vector math is `zip_with`/`aggregate` expressions in double
  * precision (codegen'd, deterministic left-to-right fold).
  */
object Similarity {

  /** Dot product of two numeric array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Recall@k of an approximate top-k result against the exact one:
    * per query, the fraction of true neighbors the ANN run found.
    * Returned as a deterministic (query_id, recall_ok) row so a
    * correctness gate can hash-check ANN QUALITY, not just row shape —
    * fixed seeds/init make the approximate result, and therefore the
    * boolean, reproducible. */
  def recallOk(approx: DataFrame, exact: DataFrame, threshold: Double): DataFrame = {
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .withColumn("__hit", lit(1))
    exact.select(col("query_id"), col("neighbor_id"))
      .join(hits, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg((sum(coalesce(col("__hit"), lit(0))) / count(lit(1))).as("recall"))
      .select(col("query_id"),
        (col("recall") >= threshold).as("recall_ok"))
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) corpus DataFrame — arbitrarily large
    * @param queries (idCol, vecCol) query DataFrame — small, broadcast
    * @return query_id, neighbor_id, cosine (rounded to 6), rank
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, kNeighbors: Int = 5): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("nvec")), 6).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kNeighbors)
  }

  /** Deterministic random hyperplanes: `planes(t)(p)(d)` from a seeded
    * PRNG so signatures are stable across runs and executors. */
  private def hyperplanes(tables: Int, planesPerTable: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(tables, planesPerTable, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane LSH bucket ids, one per table: bit p of the
    * bucket id for table t is `sign(v . plane(t,p))`. */
  def lshBuckets(
      vec: Column, dim: Int,
      tables: Int = 4, planesPerTable: Int = 8, seed: Long = 42L): Column = {
    val hp = hyperplanes(tables, planesPerTable, dim, seed)
    val v = vec.cast("array<double>")
    array((0 until tables).map { t =>
      val bits = (0 until planesPerTable).map { p =>
        val plane = array(hp(t)(p).map(lit).toIndexedSeq: _*)
        when(dot(v, plane) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }
      bits.reduce((a, b) => a.bitwiseOR(b))
    }: _*)
  }

  /** IVF-style ANN: k-means lists + nProbe probing.
    *
    * Centroids are trained with `iterations` Lloyd steps executed as
    * DataFrame jobs (assignment = argmax-of-similarity expression;
    * update = per-dimension mean via posexplode + groupBy), seeded
    * deterministically from the first `nLists` corpus vectors. At
    * query time only the posting lists of the `nProbe` nearest
    * centroids are scanned — the classic way to avoid a full corpus
    * scan per query set at 100 TB.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      kNeighbors: Int = 5, nLists: Int = 16, nProbe: Int = 4,
      iterations: Int = 1): DataFrame = {
    val trained = trainIvf(corpus, idCol, vecCol, nLists, iterations)
    val probes = probeLists(queries, idCol, vecCol, trained.centroids, nProbe)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    trained.assigned.join(broadcast(probes), "list")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        // unit vectors: dot IS the cosine of the originals
        round(dot(col("qvec"), col("nvec")), 6).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kNeighbors)
  }

  /** Train an IVF index ONCE and persist it (reference role:
    * paimon-faiss/ + VectorSearchTable.java:35 — a global vector index
    * created by a procedure, probed by queries). Two parquet tables
    * under `indexDir`:
    *  - centroids: (list INT, centroid ARRAY<double>) — tiny;
    *  - assignments: (neighbor_id, nvec ARRAY<double>, list INT),
    *    PARTITIONED BY list, holding the unit-normalized vectors.
    * Query time then reads ONLY the probed lists' partitions — no
    * training jobs, no corpus scan; at 100 TB this is what makes ANN
    * usable (per-query Lloyd iterations are not). */
  def buildIvfIndex(
      corpus: DataFrame, indexDir: String,
      idCol: String, vecCol: String, dim: Int,
      nLists: Int = 16, iterations: Int = 1): Unit = {
    val trained = trainIvf(corpus, idCol, vecCol, nLists, iterations)
    val session = corpus.sparkSession
    import session.implicits._
    trained.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    trained.assigned // (neighbor_id, nvec, list)
      .write.mode("overwrite").partitionBy("list")
      .parquet(s"$indexDir/assignments")
  }

  /** ANN over a persisted IVF index: rank the `nProbe` nearest lists'
    * vectors by exact cosine. Runs zero training jobs — centroids are
    * a tiny parquet read, and the `list` partitioning prunes the
    * assignments scan to the probed lists. */
  def ivfIndexTopK(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, idCol: String, vecCol: String,
      kNeighbors: Int = 5, nProbe: Int = 4): DataFrame = {
    val centroids = spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val probes = probeLists(queries, idCol, vecCol, centroids, nProbe)
    val probedLists = probes.select("list").distinct()
      .collect().map(_.getInt(0)).toSeq
    val cands = spark.read.parquet(s"$indexDir/assignments")
      .filter(col("list").isin(probedLists: _*)) // partition-pruned
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands.join(broadcast(probes), "list")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qvec"), col("nvec")), 6).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kNeighbors)
  }

  private case class TrainedIvf(
      centroids: Array[Array[Double]], assigned: DataFrame)

  /** Distributed Lloyd training shared by the per-query and persisted
    * IVF paths: assignment is an argmax-of-similarity expression over
    * broadcast centroids, update a per-dimension mean. */
  private def trainIvf(
      corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iterations: Int): TrainedIvf = {
    val session = corpus.sparkSession
    val c = unitNorm(corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("nvec")), "nvec")
    var centroids: Array[Array[Double]] = c.orderBy("neighbor_id")
      .limit(nLists).collect().map(_.getSeq[Double](1).toArray)
    for (_ <- 0 until iterations) {
      val means = withCentroidSims(c, "nvec", centroids)
        .select(argmaxSim.as("list"), posexplode(col("nvec")).as(Seq("d", "x")))
        .groupBy("list", "d").agg(avg("x").as("m"))
        .groupBy("list")
        .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
          e => e.getField("m")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.indices
        .map(i => means.getOrElse(i, centroids(i))).toArray
    }
    val assigned = withCentroidSims(c, "nvec", centroids)
      .withColumn("list", argmaxSim).drop("__sims")
    TrainedIvf(centroids, assigned)
  }

  /** (query_id, qvec, list) rows: each query exploded to its nProbe
    * nearest centroid lists. */
  private def probeLists(
      queries: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val probeIdx = slice(array_distinct(transform(
      reverse(array_sort(col("__sims"))),
      s => (array_position(col("__sims"), s) - 1).cast("int"))), 1, nProbe)
    withCentroidSims(
      unitNorm(queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qvec")), "qvec"), "qvec", centroids)
      .select(col("query_id"), col("qvec"), explode(probeIdx).as("list"))
      .drop("__sims")
  }

  /** unit-normalize via a compiled UDF (a tight numeric inner loop is
    * ~100x faster JIT-compiled than as interpreted zip_with/aggregate
    * lambda trees; the documented exception in the
    * functions>Expression>UDF ladder). */
  private def unitNorm(df: DataFrame, vec: String): DataFrame = {
    val unitUdf = udf { (v: Seq[Double]) =>
      var i = 0; var s = 0.0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0) v else v.map(_ / n)
    }
    df.withColumn(vec, unitUdf(col(vec)))
  }

  /** one UDF call per row computes similarity to ALL centroids */
  private def withCentroidSims(
      df: DataFrame, vec: String, centroids: Array[Array[Double]]): DataFrame = {
    val session = df.sparkSession
    val cents = session.sparkContext.broadcast(centroids.map { ct =>
      val n = math.sqrt(ct.map(x => x * x).sum)
      if (n == 0) ct else ct.map(_ / n)
    })
    val simsUdf = udf { (v: Seq[Double]) =>
      val cs = cents.value
      val arr = v.toArray
      cs.map { ct =>
        var i = 0; var s = 0.0
        while (i < arr.length && i < ct.length) { s += arr(i) * ct(i); i += 1 }
        s
      }.toSeq
    }
    df.withColumn("__sims", simsUdf(col(vec)))
  }

  private def argmaxSim: Column =
    (array_position(col("__sims"), array_max(col("__sims"))) - 1).cast("int")

  /** Approximate top-k: probe only corpus rows that share an LSH bucket
    * with the query in at least one table, then rank candidates by
    * exact cosine. Corpus side shuffles by (table, bucket) — bounded
    * fan-out of `tables` rows per corpus vector.
    *
    * Parameter intuition: a neighbor at angle θ collides in one table
    * with probability (1 - θ/π)^planesPerTable, and recall is
    * 1-(1-p)^tables — FEWER planes and MORE tables raise recall at the
    * cost of larger candidate sets. 8×4 measures recall 0.6-1.0 on the
    * synthetic embeddings; the old 4×8 default measured ~0. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      kNeighbors: Int = 5, tables: Int = 8, planesPerTable: Int = 4,
      seed: Long = 42L): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        posexplode(lshBuckets(col(vecCol), dim, tables, planesPerTable, seed))
          .as(Seq("tbl", "bucket")))
    val c = withBuckets(corpus, "neighbor_id", "nvec")
    val q = withBuckets(queries, "query_id", "qvec")
    val cands = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qvec"), col("neighbor_id"), col("nvec"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("nvec")), 6).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kNeighbors)
  }
}
