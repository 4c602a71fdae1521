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
    * bucket id for table t is `sign(v . plane(t,p))`. Defaults match
    * [[lshTopK]]'s measured 8×4 configuration — the old 4×8 default
    * measured recall ~0 on the synthetic embeddings, and a direct
    * caller relying on defaults must not inherit a known-useless
    * bucketing. */
  def lshBuckets(
      vec: Column, dim: Int,
      tables: Int = 8, planesPerTable: Int = 4, seed: Long = 42L): Column = {
    val hp = hyperplanes(tables, planesPerTable, dim, seed)
    // Compiled one-pass loop (r17) — the documented UDF exception for
    // tight numeric inner loops (see Dedup.cosineUdf): the expression
    // form built tables×planes `dot` HOF subtrees over per-plane
    // 64-literal arrays (~6400 plan nodes at 10×10×64), whose
    // ANALYSIS+CODEGEN dominated every caller's wall time (p11: ~3.3 s
    // driver gap before the first real job) and whose interpreted
    // zip_with/aggregate evaluation dominated the task time. Bit
    // semantics are IDENTICAL: per plane, a left-to-right double fold
    // of v(i)*plane(i) (same IEEE op order as aggregate∘zip_with),
    // sign >= 0 sets bit p; a null vector or a length≠dim / null-element
    // vector yields the same all-zero buckets the null-padded zip_with
    // produced.
    val f = udf { (v: Seq[java.lang.Double]) =>
      if (v == null) Array.fill(tables)(0L)
      else {
        val ok = v.length == dim && !v.contains(null)
        val arr = if (ok) { val a = new Array[Double](dim)
          var i = 0; while (i < dim) { a(i) = v(i); i += 1 }; a } else null
        Array.tabulate(tables) { t =>
          if (!ok) 0L
          else {
            var bucket = 0L
            var p = 0
            while (p < planesPerTable) {
              val plane = hp(t)(p)
              var s = 0.0; var i = 0
              while (i < dim) { s += arr(i) * plane(i); i += 1 }
              if (s >= 0) bucket |= (1L << p)
              p += 1
            }
            bucket
          }
        }
      }
    }
    f(vec.cast("array<double>"))
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
    *
    * Default `nProbe` is the measured recall@10 ≥ 0.95 setting at the
    * derived-×10 probe (BENCH_NOTES r17: nProbe 6 → 0.75, 12 → 0.95,
    * 24 → 1.00 at nLists=16); drop it for latency once YOUR corpus's
    * recall is measured, not before.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      kNeighbors: Int = 5, nLists: Int = 16, nProbe: Int = 12,
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
      kNeighbors: Int = 5, nProbe: Int = 12): DataFrame = {
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

  private[operators] case class TrainedIvf(
      centroids: Array[Array[Double]], assigned: DataFrame)

  /** Distributed Lloyd training shared by the per-query and persisted
    * IVF paths: assignment is an argmax-of-similarity expression over
    * broadcast centroids, update a per-dimension mean. */
  private[operators] def trainIvf(
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
    // tie-safe: sort (−sim, idx) pairs — mapping sorted sims back
    // through array_position collapses TIED similarities onto the
    // first occurrence's index (a zero query vector ties every
    // centroid and would probe 1 list instead of nProbe)
    val probeIdx = slice(transform(array_sort(zip_with(
      col("__sims"), sequence(lit(0), lit(centroids.length - 1)),
      (s, i) => struct((lit(0.0) - s).as("ns"), i.as("i")))),
      x => x.getField("i").cast("int")), 1, nProbe)
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

  // ------------------------------------------------------------------
  // HNSW (sharded): graph-based ANN, the recall/latency class the
  // reference reaches through faiss (paimon-faiss global vector
  // indexes) — here a pure-JVM implementation of the public
  // Malkov & Yashunin algorithm (arXiv:1603.09320), sharded the way
  // production systems scale it: each corpus partition builds an
  // in-memory graph, every query searches all shards, the per-shard
  // top-k merge globally. At 100 TB the shard count grows so one
  // shard's vectors fit an executor; build cost is one corpus shuffle
  // + per-partition construction, query cost is O(shards · ef · log n)
  // — never a full scan.
  //
  // Everything is deterministic so a recall gate can hash-check it:
  // shard assignment hashes the id, insertion order is sorted by id,
  // and each node's level comes from a splitmix64 of its id — never
  // from RNG sequence state.
  // ------------------------------------------------------------------

  /** Sharded HNSW top-k by cosine.
    *
    * @param shards corpus partitions (= independent graphs)
    * @param m max neighbors per node per layer (M; layer 0 keeps 2M)
    * @param efConstruction beam width while building
    * @param efSearch beam width while querying (≥ kNeighbors). The
    *        default is the measured recall@10 ≥ 0.95 setting at the
    *        derived-×10 probe (BENCH_NOTES r17: ef 48 → 0.79-0.83,
    *        128 → 0.95-0.97 on m=8/efC=64 graphs; a denser m=16/
    *        efC=128 build reaches 0.98 at ef=64).
    */
  def hnswTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      kNeighbors: Int = 5, shards: Int = 4, m: Int = 8,
      efConstruction: Int = 64, efSearch: Int = 128): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // queries ship once per executor as a broadcast, not once per task
    // in the closure — the difference between 5 gate queries and a
    // 10^5-query batch sweep
    val qB = spark.sparkContext.broadcast(collectQueries(queries, idCol, vecCol))
    val shard = pmod(xxhash64(col(idCol)), lit(shards)).cast("int")
    val perShard = corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .repartition(shards, shard)
      .sortWithinPartitions("id") // deterministic insertion order
      .mapPartitions { rows =>
        val nodes = rows.map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toArray
        if (nodes.isEmpty) Iterator.empty
        else {
          val g = new HnswGraph(m, efConstruction)
          nodes.foreach { case (id, v) => g.insert(id, v) }
          searchAll(g, qB.value, efSearch, kNeighbors)
        }
      }.toDF("query_id", "neighbor_id", "cosine")
    rankTopK(perShard, kNeighbors)
  }

  /** Persisted-index metadata, written at build time so append and
    * probe resolve the SAME shard count / graph parameters the index
    * was built with — an append routed with a different shard count
    * would silently misplace vectors. */
  private[graft] case class HnswIndexMeta(
      shards: Int, m: Int, efConstruction: Int, dim: Int)

  /** Soft bound on one shard's serialized graph blob. The HARD ceiling
    * is ~2 GB (a shard is one JVM byte array and one parquet cell);
    * past the soft bound build/append WARN so the operator re-shards
    * long before the hard wall. */
  private[graft] val HnswShardSoftBoundBytes: Long = 256L * 1024 * 1024

  /** Approximate serialized bytes per node: id(8) + vector(dim×8) +
    * level(4) + adjacency (≈2M level-0 + ≈M upper ints) + framing. */
  private def hnswPerNodeBytes(dim: Int, m: Int): Long =
    8L + 8L * dim + 4L + 4L * (3L * m) + 48L

  /** Shard count needed to keep each shard's blob under the soft
    * bound; never below the requested count (determinism: the caller's
    * count is a floor, and small corpora keep it exactly). */
  private[graft] def deriveHnswShards(
      requested: Int, corpusCount: Long, dim: Int, m: Int): Int = {
    val need = math.ceil(
      corpusCount.toDouble * hnswPerNodeBytes(dim, m) / HnswShardSoftBoundBytes).toLong
    math.max(requested.toLong, math.max(1L, need)).min(Int.MaxValue).toInt
  }

  private def simLog = org.slf4j.LoggerFactory.getLogger("graft.Similarity")

  private def atomicWriteString(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val tmp = java.nio.file.Paths.get(path + ".tmp." + java.util.UUID.randomUUID())
    java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def hnswGenNumber(name: String): Int =
    if (name == "graphs") 0 else name.stripPrefix("graphs-gen-").toInt

  /** Resolve the current generation's graphs directory: the CURRENT
    * pointer file when valid, else the highest existing generation
    * (crash recovery / pre-pointer layouts). Generations flip with ONE
    * atomic pointer write, so a concurrent probe (or a crash at any
    * point of an append) always finds a complete directory — never the
    * no-graphs window a two-move directory swap had. */
  private[graft] def currentHnswGraphs(indexDir: String): String = {
    val curFile = java.nio.file.Paths.get(s"$indexDir/CURRENT")
    val pointed =
      if (java.nio.file.Files.exists(curFile))
        Some(new String(java.nio.file.Files.readAllBytes(curFile), "UTF-8").trim)
      else None
    pointed.filter(n => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$indexDir/$n"))) match {
      case Some(n) => s"$indexDir/$n"
      case None =>
        val gens = graft.core.FsUtil.listAll(java.nio.file.Paths.get(indexDir))
          .map(_.getFileName.toString)
          .filter(n => n == "graphs" || n.startsWith("graphs-gen-"))
        if (gens.isEmpty)
          throw new IllegalStateException(s"no HNSW graphs under $indexDir")
        s"$indexDir/${gens.maxBy(hnswGenNumber)}"
    }
  }

  private def readHnswMeta(indexDir: String): Option[HnswIndexMeta] = {
    val p = java.nio.file.Paths.get(s"$indexDir/meta.json")
    if (!java.nio.file.Files.exists(p)) None
    else scala.util.Try(graft.core.Json.read(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"),
      classOf[HnswIndexMeta])).toOption
  }

  /** Build the sharded HNSW index ONCE and persist it under `indexDir`
    * (reference role: paimon-faiss persisted global vector indexes,
    * CreateGlobalIndexProcedure — same amortization as the persisted
    * IVF in [[buildIvfIndex]]): one parquet row per shard holding the
    * serialized graph (ids, unit vectors, levels, links). Build cost
    * is one corpus shuffle + per-partition construction; queries then
    * run ZERO build jobs.
    *
    * Shard-count governance: a shard's graph serializes to ONE byte
    * array / parquet cell, hard-capped near 2 GB — `shards` is
    * therefore a FLOOR, and the effective count is derived from
    * corpus count × dimension so each blob stays under
    * [[HnswShardSoftBoundBytes]] (the derivation is logged when it
    * raises the request). The effective count is persisted in
    * meta.json and returned; [[appendToHnswIndex]] always routes by
    * the persisted count.
    *
    * @return the effective shard count the index was built with */
  def buildHnswIndex(
      corpus: DataFrame, indexDir: String,
      idCol: String, vecCol: String,
      shards: Int = 4, m: Int = 8, efConstruction: Int = 64,
      knownCount: Option[Long] = None, knownDim: Option[Int] = None): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // shard derivation needs (count, dim) BEFORE the build shuffle.
    // Callers that already know them (the table path reads count from
    // manifest stats — zero jobs) pass them in so the corpus is scanned
    // exactly once; otherwise one extra agg pass derives both.
    val (cnt, dim) = (knownCount, knownDim) match {
      case (Some(c), Some(d)) => (c, d)
      case _ =>
        val head = corpus
          .agg(count(lit(1)), max(size(col(vecCol)))).head()
        (knownCount.getOrElse(head.getLong(0)),
          knownDim.getOrElse(if (head.isNullAt(1)) 0 else head.getInt(1)))
    }
    val effShards = deriveHnswShards(shards, cnt, dim, m)
    if (effShards > shards)
      simLog.warn(s"HNSW shard count raised $shards -> $effShards: " +
        s"$cnt vectors x dim $dim would exceed the per-shard blob bound " +
        s"(${HnswShardSoftBoundBytes / (1024 * 1024)} MB soft, ~2 GB hard)")
    val shard = pmod(xxhash64(col(idCol)), lit(effShards)).cast("int")
    val soft = HnswShardSoftBoundBytes
    corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"), shard.as("shard"))
      .repartition(effShards, col("shard"))
      .sortWithinPartitions("id") // deterministic insertion order
      .mapPartitions { rows =>
        // hash partitioning can land SEVERAL shard values in one
        // partition — build one graph PER SHARD PRESENT (all rows of a
        // shard hash to one partition, so each shard still yields
        // exactly one blob globally); a single buf.head-labeled blob
        // would mislabel multi-shard partitions and leave appends
        // growing detached graphs
        rows.toArray.groupBy(_.getInt(2)).iterator.map { case (sh, buf) =>
          val g = new HnswGraph(m, efConstruction)
          buf.foreach(r => g.insert(r.getLong(0), r.getSeq[Double](1).toArray))
          val bytes = g.toBytes
          if (bytes.length > soft)
            org.slf4j.LoggerFactory.getLogger("graft.Similarity").warn(
              s"HNSW shard $sh blob ${bytes.length} B exceeds " +
                s"the soft bound; rebuild with more shards (hard cap ~2 GB)")
          (sh, bytes)
        }
      }.toDF("shard", "graph")
      .write.mode("overwrite").parquet(s"$indexDir/graphs")
    atomicWriteString(s"$indexDir/meta.json",
      graft.core.Json.write(HnswIndexMeta(effShards, m, efConstruction, dim)))
    atomicWriteString(s"$indexDir/CURRENT", "graphs")
    effShards
  }

  /** Incremental index maintenance: insert one batch into the
    * persisted shard graphs WITHOUT rebuilding — each shard
    * deserializes its graph, inserts the batch's id-sorted rows (HNSW
    * insertion is naturally incremental; levels derive from
    * splitmix64(id), so determinism per shard state is preserved) and
    * re-serializes. Cost is O(batch × log corpus) distance work +
    * rewriting the touched shard blobs, never a corpus re-scan — the
    * growth path a 100 TB embedding store needs (the reference's faiss
    * indexes are likewise add-incremental). Writes a new generation
    * directory and swaps it in, so concurrent probes keep reading a
    * complete graphs file. */
  def appendToHnswIndex(
      increment: DataFrame, indexDir: String,
      idCol: String, vecCol: String,
      shards: Int = 4, m: Int = 8, efConstruction: Int = 64): Unit = {
    val spark = increment.sparkSession
    import spark.implicits._
    // the persisted meta wins over the caller's parameters: routing an
    // append with a different shard count than the build would place
    // new vectors in shards probes never search
    val meta = readHnswMeta(indexDir)
    val effShards = meta.map(_.shards).getOrElse(shards)
    val mC = meta.map(_.m).getOrElse(m)
    val efC = meta.map(_.efConstruction).getOrElse(efConstruction)
    val curDir = currentHnswGraphs(indexDir)
    val shard = pmod(xxhash64(col(idCol)), lit(effShards)).cast("int")
    val inc = increment
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"), shard.as("shard"))
      .as[(Long, Seq[Double], Int)]
      .groupByKey(_._3)
    val existing = spark.read.parquet(curDir)
      .select(col("shard"), col("graph")).as[(Int, Array[Byte])]
      .groupByKey(_._1)
    val soft = HnswShardSoftBoundBytes
    val updated = existing.cogroup(inc) { (sh, graphs, rows) =>
      val gBytes = graphs.toSeq.headOption.map(_._2)
      val rowsArr = rows.toArray.sortBy(_._1)
      if (rowsArr.isEmpty && gBytes.isDefined) Iterator((sh, gBytes.get))
      else {
        val g = gBytes.map(HnswGraph.fromBytes)
          .getOrElse(new HnswGraph(mC, efC))
        rowsArr.foreach { case (id, vec, _) => g.insert(id, vec.toArray) }
        val bytes = g.toBytes
        if (bytes.length > soft)
          org.slf4j.LoggerFactory.getLogger("graft.Similarity").warn(
            s"HNSW shard $sh blob grew to ${bytes.length} B (> soft bound); " +
              "rebuild the index with more shards (hard cap ~2 GB/shard)")
        Iterator((sh, bytes))
      }
    }.toDF("shard", "graph")
    // generation swap via ONE atomic pointer flip: write the next
    // generation beside the current one, then atomically repoint
    // CURRENT. A probe (or a crash) at ANY instant resolves a complete
    // generation — there is no window with no graphs directory. The
    // generation before the previous one is swept after the flip.
    val curName = java.nio.file.Paths.get(curDir).getFileName.toString
    val nextName = s"graphs-gen-${hnswGenNumber(curName) + 1}"
    updated.write.mode("overwrite").parquet(s"$indexDir/$nextName")
    atomicWriteString(s"$indexDir/CURRENT", nextName)
    graft.core.FsUtil.listAll(java.nio.file.Paths.get(indexDir))
      .filter { p =>
        val n = p.getFileName.toString
        (n == "graphs" || n.startsWith("graphs-gen-")) &&
          hnswGenNumber(n) < hnswGenNumber(curName)
      }
      .foreach(d => graft.core.FsUtil.walkAll(d).reverse
        .foreach(java.nio.file.Files.deleteIfExists(_)))
  }

  /** ANN over a persisted HNSW index: deserialize each shard's graph
    * executor-side, search the broadcast query set, merge shard top-k
    * globally. The plan's only scan is the (tiny) graphs parquet — no
    * corpus scan, no rebuild. */
  def hnswIndexTopK(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, idCol: String, vecCol: String,
      kNeighbors: Int = 5, efSearch: Int = 128): DataFrame = {
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(collectQueries(queries, idCol, vecCol))
    val perShard = spark.read.parquet(currentHnswGraphs(indexDir))
      .select("graph").as[Array[Byte]]
      .mapPartitions(_.flatMap { bytes =>
        val g = HnswGraph.fromBytes(bytes)
        searchAll(g, qB.value, efSearch, kNeighbors)
      }).toDF("query_id", "neighbor_id", "cosine")
    rankTopK(perShard, kNeighbors)
  }

  private def collectQueries(
      queries: DataFrame, idCol: String, vecCol: String): Array[(Long, Array[Double])] =
    queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  private def searchAll(
      g: HnswGraph, qs: Array[(Long, Array[Double])],
      efSearch: Int, k: Int): Iterator[(Long, Long, Double)] =
    qs.iterator.flatMap { case (qid, qv) =>
      g.search(qv, math.max(efSearch, k), k, exclude = qid)
        .map { case (nid, sim) => (qid, nid, sim) }
    }

  private def rankTopK(perShard: DataFrame, kNeighbors: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    perShard
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kNeighbors)
  }

  /** One shard's in-memory HNSW graph. Vectors are unit-normalized at
    * insert so cosine == dot. Node levels derive from splitmix64(id)
    * (order-independent determinism); neighbor selection is
    * closest-M; links are bidirectional with degree-capped pruning. */
  private[operators] final class HnswGraph(m: Int, efC: Int) extends Serializable {
    private val mL = 1.0 / math.log(m.toDouble)
    private val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    private val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    private val nodeLevel = scala.collection.mutable.ArrayBuffer.empty[Int]
    /** links(level) is touched only up to each node's own level */
    private val links =
      scala.collection.mutable.ArrayBuffer.empty[Array[scala.collection.mutable.ArrayBuffer[Int]]]
    private var entry = -1
    private var maxLevel = -1

    private def splitmix64(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }

    private def levelOf(id: Long): Int = {
      // uniform in (0,1] from the id's hash — insertion-order-free
      val u = ((splitmix64(id) >>> 11).toDouble + 1.0) / (1L << 53).toDouble
      math.min((-math.log(u) * mL).toInt, 24)
    }

    private def norm(v: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) v else { val o = new Array[Double](v.length)
        i = 0; while (i < v.length) { o(i) = v(i) / n; i += 1 }; o }
    }

    private def dotV(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }

    /** Beam search one layer: best `ef` candidates from `seeds`. */
    private def searchLayer(
        qv: Array[Double], seeds: Seq[Int], ef: Int, level: Int): Seq[Int] = {
      val visited = scala.collection.mutable.HashSet.empty[Int]
      // candidates max-heap by sim; results min-heap by sim (bounded ef)
      val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by(c => (c._1, -c._2)))
      val res = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by(c => (-c._1, c._2)))
      seeds.foreach { s =>
        if (visited.add(s)) { val d = dotV(qv, vecs(s)); cand.enqueue((d, s)); res.enqueue((d, s)) }
      }
      while (res.size > ef) res.dequeue()
      while (cand.nonEmpty) {
        val (cd, c) = cand.dequeue()
        if (res.size >= ef && cd < res.head._1) { cand.clear() }
        else links(level)(c).foreach { nb =>
          if (visited.add(nb)) {
            val d = dotV(qv, vecs(nb))
            if (res.size < ef || d > res.head._1) {
              cand.enqueue((d, nb)); res.enqueue((d, nb))
              if (res.size > ef) res.dequeue()
            }
          }
        }
      }
      res.toSeq.sortBy(r => (-r._1, ids(r._2))).map(_._2)
    }

    private def capOf(level: Int): Int = if (level == 0) 2 * m else m

    /** Diverse neighbor selection (the paper's Algorithm 4,
      * SELECT-NEIGHBORS-HEURISTIC, with keepPrunedConnections):
      * walking candidates closest-first, keep c only if it is closer
      * to `base` than to every already-kept neighbor, then pad with
      * the closest skipped ones up to `cap`. Plain closest-M would
      * keep only intra-cluster links and DISCONNECT tight clusters —
      * the one failure mode a graph ANN must not have (a shard whose
      * entry lands in the wrong cluster then returns pure noise). */
    private def selectNeighbors(
        base: Array[Double], cands: Seq[Int], cap: Int): Seq[Int] = {
      val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
      val skipped = scala.collection.mutable.ArrayBuffer.empty[Int]
      cands.foreach { c =>
        if (kept.size < cap) {
          val dBase = 1.0 - dotV(base, vecs(c))
          if (kept.forall(k => 1.0 - dotV(vecs(k), vecs(c)) > dBase)) kept += c
          else skipped += c
        }
      }
      kept ++= skipped.take(cap - kept.size)
      kept.toSeq
    }

    def insert(id: Long, rawVec: Array[Double]): Unit = {
      val v = norm(rawVec)
      val lvl = levelOf(id)
      val node = ids.length
      ids += id; vecs += v; nodeLevel += lvl
      while (links.length <= lvl)
        links += null
      (0 to lvl).foreach { l =>
        if (links(l) == null)
          links(l) = Array.empty
        links(l) = links(l).padTo(node + 1, null)
        links(l)(node) = scala.collection.mutable.ArrayBuffer.empty[Int]
      }
      // pad lower layers' arrays so indices stay aligned
      (0 until links.length).foreach { l =>
        if (links(l) != null && links(l).length <= node)
          links(l) = links(l).padTo(node + 1, null)
      }
      if (entry < 0) { entry = node; maxLevel = lvl; return }
      var ep = Seq(entry)
      // greedy descent through layers above the node's level
      var l = maxLevel
      while (l > lvl) { ep = searchLayer(v, ep, 1, l); l -= 1 }
      // connect on each shared layer
      l = math.min(lvl, maxLevel)
      while (l >= 0) {
        val found = searchLayer(v, ep, efC, l)
        val chosen = selectNeighbors(v, found, capOf(l))
        chosen.foreach { nb =>
          links(l)(node) += nb
          links(l)(nb) += node
          if (links(l)(nb).length > capOf(l)) {
            // re-select the neighbor's list with the same diversity
            // heuristic (closest-first order), never plain closest-cap
            val sorted = links(l)(nb).toSeq
              .sortBy(x => (-dotV(vecs(nb), vecs(x)), ids(x)))
            links(l)(nb) = scala.collection.mutable.ArrayBuffer(
              selectNeighbors(vecs(nb), sorted, capOf(l)): _*)
          }
        }
        ep = found
        l -= 1
      }
      if (lvl > maxLevel) { maxLevel = lvl; entry = node }
    }

    /** Top-k (id, cosine) for a query vector; `exclude` drops the
      * query's own id when it lives in this shard. */
    def search(rawQ: Array[Double], ef: Int, k: Int, exclude: Long): Seq[(Long, Double)] = {
      if (entry < 0) return Seq.empty
      val qv = norm(rawQ)
      var ep = Seq(entry)
      var l = maxLevel
      while (l > 0) { ep = searchLayer(qv, ep, 1, l); l -= 1 }
      searchLayer(qv, ep, math.max(ef, k), 0)
        .map(n => (ids(n), dotV(qv, vecs(n))))
        .filter(_._1 != exclude)
        .sortBy(r => (-r._2, r._1))
        .take(k)
    }

    /** Compact, version-free serialization for the persisted index
      * sidecar: explicit primitive streams (ids, unit vectors flat,
      * levels, per-layer adjacency), no Java object serialization. */
    def toBytes: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      val n = ids.length
      o.writeInt(m); o.writeInt(efC)
      o.writeInt(n)
      o.writeInt(if (n == 0) 0 else vecs(0).length)
      o.writeInt(entry); o.writeInt(maxLevel)
      ids.foreach(o.writeLong)
      vecs.foreach(v => v.foreach(o.writeDouble))
      nodeLevel.foreach(o.writeInt)
      o.writeInt(links.length)
      links.foreach { lvl =>
        if (lvl == null) o.writeInt(-1)
        else {
          o.writeInt(lvl.length)
          lvl.foreach { nb =>
            if (nb == null) o.writeInt(-1)
            else { o.writeInt(nb.length); nb.foreach(o.writeInt) }
          }
        }
      }
      o.flush()
      bos.toByteArray
    }
  }

  private[operators] object HnswGraph {
    def fromBytes(bytes: Array[Byte]): HnswGraph = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val m = in.readInt(); val efC = in.readInt()
      val g = new HnswGraph(m, efC)
      val n = in.readInt(); val dim = in.readInt()
      g.entry = in.readInt(); g.maxLevel = in.readInt()
      (0 until n).foreach(_ => g.ids += in.readLong())
      (0 until n).foreach { _ =>
        val v = new Array[Double](dim)
        var i = 0; while (i < dim) { v(i) = in.readDouble(); i += 1 }
        g.vecs += v
      }
      (0 until n).foreach(_ => g.nodeLevel += in.readInt())
      val nLevels = in.readInt()
      (0 until nLevels).foreach { _ =>
        val len = in.readInt()
        if (len < 0) g.links += null
        else g.links += Array.tabulate(len) { _ =>
          val c = in.readInt()
          if (c < 0) null
          else {
            val b = scala.collection.mutable.ArrayBuffer.empty[Int]
            var i = 0; while (i < c) { b += in.readInt(); i += 1 }
            b
          }
        }
      }
      g
    }
  }
}
