package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis => TA, ZOrder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct operator-level properties (tier-1 unit tests; the gate
  * queries cover the same operators end-to-end over testdata). */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head.get(0)
  }

  test("tokenization, shingles, n-grams edge cases") {
    assert(one(TA.tokenCount(lit("hello world  foo"))) == 3L)
    assert(one(TA.tokenCount(lit("  single "))) == 1L)
    assert(one(TA.shingles(lit("a b c d"), 3)) ==
      Seq("a b c", "b c d"))
    assert(one(TA.shingles(lit("a b"), 3)) == Seq("a b")) // shorter than w
    assert(one(Dedup.charNgrams(lit("abcd"), 3)) == Seq("abc", "bcd"))
    assert(one(Dedup.charNgrams(lit("ab"), 3)) == Seq("ab"))
  }

  test("jaccard is 1 on identical sets, 0 on disjoint, symmetric bounds") {
    val a = array(lit("x"), lit("y"))
    val b = array(lit("y"), lit("x"))
    val c = array(lit("z"))
    assert(one(Dedup.jaccard(a, b)) == 1.0)
    assert(one(Dedup.jaccard(a, c)) == 0.0)
  }

  test("simhash: similar texts are close in hamming, different are far") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank now"),
      (3L, "completely unrelated words about database storage engines and parquet files"))
      .toDF("id", "text")
    val sh = Dedup.simhashTable(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
    assert(hamming(sh(1L), sh(2L)) <= 12)
  }

  test("minhash signatures: near-identical docs agree on most components") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (3L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("id", "text")
    val sig = Dedup.minhashSignatureTable(df, "id", "text", k = 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count(p => p._1 == p._2)
    assert(agree(sig(1L), sig(2L)) > agree(sig(1L), sig(3L)))
    assert(agree(sig(1L), sig(3L)) <= 4)
  }

  test("langId recognizes stopword profiles and script shortcuts") {
    assert(one(TA.langId(lit("the cat and the dog of the house"))) == "en")
    assert(one(TA.langId(lit("der Hund und die Katze ist nicht da"))) == "de")
    assert(one(TA.langId(lit("el perro es una casa con más por"))) == "es")
    assert(one(TA.langId(lit("le chien et le chat dans la maison pour vous"))) == "fr")
    assert(one(TA.langId(lit("il cane che sono anche questo per gli"))) == "it")
    assert(one(TA.langId(lit("o cachorro não são para com mais pelo"))) == "pt")
    assert(one(TA.langId(lit("het huis een van dat niet voor deze"))) == "nl")
    assert(one(TA.langId(lit("数据库 存储 引擎"))) == "zh")
    assert(one(TA.langId(lit("データベース ストレージ"))) == "ja")
    assert(one(TA.langId(lit("데이터베이스 저장"))) == "ko")
    assert(one(TA.langId(lit("база данных хранение"))) == "ru")
    assert(one(TA.langId(lit("قاعدة البيانات"))) == "ar")
    assert(one(TA.langId(lit("βάση δεδομένων"))) == "el")
    assert(one(TA.langId(lit("डेटाबेस भंडारण"))) == "hi")
    assert(one(TA.langId(lit("xyzzy plugh"))) == "und")
  }

  test("qualityScore ranks clean prose above digit/punct soup") {
    val clean = one(TA.qualityScore(lit(
      "a readable sentence with plain words and reasonable length overall"))).asInstanceOf[Double]
    val soup = one(TA.qualityScore(lit("00 11 !! ?? 22 ## 33 $$ 44"))).asInstanceOf[Double]
    assert(clean > soup)
    assert(clean <= 1.0 && soup >= 0.0)
  }

  test("z-values preserve per-dimension dominance") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 1L)).toDF("x", "y")
    val z = df.select(ZOrder.zvalue(df, Seq("x", "y")).as("z"))
      .collect().map(_.getLong(0))
    // (0,0) interleaves strictly below (1,1)
    assert(z(0) < z(1))
  }

  test("frame sampler yields ceil(len/frame) / everyN frames with correct tail") {
    import spark.implicits._
    val assets = Seq((1L, "png", 8, 8, ("x" * 50).getBytes("UTF-8")))
      .toDF("asset_id", "format", "width", "height", "payload")
    val frames = Multimodal.sampleFrames(assets, frameBytes = 16, everyN = 2)
      .orderBy("frame_no").collect()
    // frames 0..3 exist (ceil(50/16)=4), sampled: 0 and 2
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    assert(frames.map(_.getLong(3)).toSeq == Seq(16L, 16L))
  }

  test("real image codecs: encode→decode→resize round-trips are pixel-exact") {
    import spark.implicits._
    val ids = Seq(2L, 3L, 7L).toDF("doc_id") // 2 → png, 3/7 → bmp
    val assets = Multimodal.syntheticImages(ids, "doc_id")
    val rows = assets.collect().map(a => a.asset_id -> a).toMap
    // payloads are REAL encoded images with magic bytes
    val png = rows(2L).payload
    assert(png.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    assert(rows(3L).payload.take(2).toSeq == Seq[Byte]('B', 'M'))
    // decode recovers the exact synthetic pattern
    val feats = Multimodal.decodeAndFeaturize(assets, dim = 4)
      .collect().map(f => f.asset_id -> f).toMap
    rows.foreach { case (id, a) =>
      val f = feats(id)
      assert(f.ok && f.width == a.width && f.height == a.height)
      val idm = id % 131071L
      val expectedSum = (for { y <- 0 until a.height; x <- 0 until a.width }
        yield (idm * 31L + 7L * x + 13L * y) % 256L).sum
      val expectedMean = expectedSum.toDouble / (a.width.toLong * a.height * 255L)
      assert(f.mean_intensity == expectedMean,
        s"id=$id mean ${f.mean_intensity} != $expectedMean")
    }
    // nearest-neighbor resize follows the pinned ⌊x·w/W⌋ mapping exactly
    val resized = Multimodal.decodeAndFeaturize(
      Multimodal.resize(assets, 10, 6), dim = 4)
      .collect().map(f => f.asset_id -> f).toMap
    rows.foreach { case (id, a) =>
      val idm = id % 131071L
      val exp = (for { y <- 0 until 6; x <- 0 until 10 } yield
        (idm * 31L + 7L * (x * a.width / 10) + 13L * (y * a.height / 6)) % 256L).sum
      assert(resized(id).ok && resized(id).width == 10 && resized(id).height == 6)
      assert(resized(id).mean_intensity == exp.toDouble / (10L * 6 * 255L))
    }
    // the failure channel: garbage bytes → ok=false row, no task failure
    val bad = Seq(Multimodal.MediaAsset(99L, "png", 4, 4,
      Array[Byte](1, 2, 3, 4))).toDS()
    val badF = Multimodal.decodeAndFeaturize(bad, dim = 4).head()
    assert(!badF.ok && badF.n_bytes == 4L)
    assert(Multimodal.resize(bad, 8, 8).head().payload.isEmpty)
  }

  test("brute-force kNN is deterministic and self-excluding") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", kNeighbors = 2).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // nearest first, no self
  }

  test("HNSW: exact on clusters, deterministic across runs, self-excluding") {
    import spark.implicits._
    // two well-separated direction clusters + noise dims: graph search
    // must return the query's own cluster, in cosine order
    val rnd = new java.util.Random(7)
    val emb = (0L until 200L).map { i =>
      val base = if (i % 2 == 0) Array(1.0, 0.05 * (i % 13)) else Array(-1.0, 0.05 * (i % 11))
      (i, base.map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 4)
    val approx = Similarity.hnswTopK(emb, q, "vec_id", "embedding",
      kNeighbors = 5, shards = 3, m = 8, efConstruction = 64, efSearch = 48)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
    // high-recall regime: graph search equals brute force here
    val rec = Similarity.recallOk(approx, exact, threshold = 0.99).collect()
    assert(rec.length == 4 && rec.forall(_.getBoolean(1)))
    // no self-neighbors
    assert(approx.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // byte-deterministic across runs (id-hashed levels, sorted insert)
    val again = Similarity.hnswTopK(emb, q, "vec_id", "embedding",
      kNeighbors = 5, shards = 3, m = 8, efConstruction = 64, efSearch = 48)
    assert(approx.collect().map(_.toString).sorted.toSeq ==
      again.collect().map(_.toString).sorted.toSeq)
  }

  test("persisted HNSW index: probe matches in-memory build, zero corpus scans") {
    import spark.implicits._
    val rnd = new java.util.Random(7)
    val emb = (0L until 200L).map { i =>
      val base = if (i % 2 == 0) Array(1.0, 0.05 * (i % 13)) else Array(-1.0, 0.05 * (i % 11))
      (i, base.map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 4)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-hnsw-idx").toString + "/idx"
    Similarity.buildHnswIndex(emb, idxDir, "vec_id", "embedding",
      shards = 3, m = 8, efConstruction = 64)
    val fromIndex = Similarity.hnswIndexTopK(spark, idxDir, q,
      "vec_id", "embedding", kNeighbors = 5, efSearch = 48)
    // serialization round-trip is exact: identical results to the
    // build-per-call path with the same deterministic parameters
    val inMemory = Similarity.hnswTopK(emb, q, "vec_id", "embedding",
      kNeighbors = 5, shards = 3, m = 8, efConstruction = 64, efSearch = 48)
    assert(fromIndex.collect().map(_.toString).sorted.toSeq ==
      inMemory.collect().map(_.toString).sorted.toSeq)
    // no rebuild: the probe plan's ONLY leaf is the graphs parquet —
    // the corpus is never scanned
    val leaves = fromIndex.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, leaves.mkString("; "))
    assert(leaves.head.output.map(_.name).contains("graph"), leaves.head.toString)
    // one blob PER SHARD, each labeled with ITS shard id — hash
    // partitioning routinely lands several shard values in one
    // partition, and a buf.head-labeled single blob would mislabel
    // the rest (and leave appends growing detached graphs)
    val labels = spark.read.parquet(s"$idxDir/graphs")
      .select("shard").collect().map(_.getInt(0)).sorted.toSeq
    assert(labels == (0 until 3), s"expected one blob per shard 0..2: $labels")
  }

  test("HNSW shard governance: derived count bounds blobs; appends flip generations atomically") {
    import spark.implicits._
    // a small corpus keeps the requested shard count exactly
    // (determinism floor)...
    assert(Similarity.deriveHnswShards(4, 1000L, 8, 8) == 4)
    // ...while a 100 TB-class corpus RAISES it: 200M × 768-dim vectors
    // cannot live in 4 one-blob shards (2 GB JVM-array/parquet-cell
    // hard cap per shard) — the derived count keeps every blob under
    // the soft bound
    val big = Similarity.deriveHnswShards(4, 200_000_000L, 768, 16)
    assert(big > 4, s"derived only $big shards")
    assert(200_000_000L * 768L * 8L / big <= Similarity.HnswShardSoftBoundBytes,
      s"$big shards still exceed the soft per-shard bound")

    // meta + generation lifecycle on a real index (noise is per-id
    // seeded so repeated vecs() calls regenerate identical vectors)
    def vecs(ids: Seq[Long]) = ids.map { i =>
      val r = new java.util.Random(i * 7919 + 11)
      val base = if (i % 2 == 0) Array(1.0, 0.05 * (i % 13)) else Array(-1.0, 0.05 * (i % 11))
      (i, base.map(x => (x + r.nextGaussian() * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-hnsw-gen").toString + "/idx"
    val eff = Similarity.buildHnswIndex(vecs(0L until 100L), idxDir,
      "vec_id", "embedding", shards = 3, m = 8, efConstruction = 64)
    assert(eff == 3) // small corpus: requested count kept
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$idxDir/meta.json")))
    assert(Similarity.currentHnswGraphs(idxDir).endsWith("/graphs"))

    // two appends: each writes a NEW generation then atomically
    // repoints CURRENT — at no instant is there no complete graphs dir
    // (the append even ignores a wrong caller shard count: meta wins)
    Similarity.appendToHnswIndex(vecs(100L until 150L), idxDir,
      "vec_id", "embedding", shards = 99)
    assert(Similarity.currentHnswGraphs(idxDir).endsWith("/graphs-gen-1"))
    Similarity.appendToHnswIndex(vecs(150L until 200L), idxDir,
      "vec_id", "embedding")
    assert(Similarity.currentHnswGraphs(idxDir).endsWith("/graphs-gen-2"))
    // retention: current + previous generations only
    val gens = graft.core.FsUtil.listAll(java.nio.file.Paths.get(idxDir))
      .map(_.getFileName.toString).filter(_.startsWith("graphs")).sorted
    assert(gens == Seq("graphs-gen-1", "graphs-gen-2"), gens.toString)
    // the grown index answers like a scratch-built one over all 200
    val q = vecs(0L until 4L)
    val grown = Similarity.hnswIndexTopK(spark, idxDir, q,
      "vec_id", "embedding", kNeighbors = 5, efSearch = 64)
    val exact = Similarity.bruteForceTopK(vecs(0L until 200L), q,
      "vec_id", "embedding", 5)
    val rec = Similarity.recallOk(grown, exact, threshold = 0.99).collect()
    assert(rec.length == 4 && rec.forall(_.getBoolean(1)))
    // crash recovery: with CURRENT gone, the highest generation serves
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$idxDir/CURRENT"))
    assert(Similarity.currentHnswGraphs(idxDir).endsWith("/graphs-gen-2"))
  }

  test("persisted IVF index matches per-query IVF and prunes to probed lists") {
    import spark.implicits._
    // two well-separated clusters in 2D
    val emb = ((0L until 20L).map(i =>
      (i, Array(1.0f + (i % 5) * 0.01f, 0.0f + (i % 3) * 0.01f))) ++
      (20L until 40L).map(i =>
        (i, Array(0.0f + (i % 5) * 0.01f, 1.0f + (i % 3) * 0.01f))))
      .toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id").isin(0L, 25L))
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivf-idx").toString + "/idx"
    Similarity.buildIvfIndex(emb, idxDir, "vec_id", "embedding",
      dim = 2, nLists = 4)
    val fromIndex = Similarity.ivfIndexTopK(spark, idxDir, queries,
      "vec_id", "embedding", kNeighbors = 3, nProbe = 1)
    val perQuery = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      dim = 2, kNeighbors = 3, nLists = 4, nProbe = 1)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(rows(fromIndex) == rows(perQuery),
      "index-served results must equal freshly-trained results")
    // partition pruning: the assignments scan plans only probed list
    // dirs (inputFiles ignores pruning, so inspect the physical scan)
    val scans = fromIndex.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("assignments")) => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScan over assignments/")
    val planned = scans.head.selectedPartitions.partitionCount
    val allLists = new java.io.File(s"$idxDir/assignments")
      .listFiles().map(_.getName).count(_.startsWith("list="))
    assert(planned < allLists,
      s"planned $planned of $allLists list partitions — expected pruning")
  }

  test("bigramNll: reference-trained scores, smoothed backoff for unseen text") {
    import spark.implicits._
    val ref = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("id", "text")
    // vocab = {the, cat, sat, ran} (V=4); c(the,cat)=2, c(the)=2 ...
    val docs = Seq(
      (10L, "the cat"),       // seen bigram: p = (2+1)/(2+4)
      (11L, "cat sat"),       // p = (1+1)/(2+4)
      (12L, "zebra quux"),    // unseen prefix: p = 1/(0+4)
      (13L, "x")              // single token: no bigrams -> absent
    ).toDF("id", "text")
    val got = graft.operators.TextAnalysis
      .bigramNll(docs, "id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def nll(p: Double) = -math.log(p)
    assert(math.abs(got(10L) - nll(3.0 / 6)) < 1e-9, got.toString)
    assert(math.abs(got(11L) - nll(2.0 / 6)) < 1e-9)
    assert(math.abs(got(12L) - nll(1.0 / 4)) < 1e-9)
    assert(!got.contains(13L))
    // surprising text scores strictly higher than in-distribution text
    assert(got(12L) > got(10L))
  }

  test("semanticDedup: keeps lowest-id representative per near-dup set, per cluster") {
    import spark.implicits._
    // two far-apart direction clusters; ids 0/1/2 near-identical in
    // cluster A (plus exact copy id 10), id 5 alone in cluster B
    def v(x: Double, y: Double) = Array(x, y).map(_.toFloat)
    val emb = Seq(
      (0L, v(1.0, 0.00)), (1L, v(1.0, 0.01)), (2L, v(1.0, 0.02)),
      (10L, v(1.0, 0.00)), // exact duplicate of id 0
      (5L, v(-1.0, 0.0)), (6L, v(-1.0, 0.9)) // B: dissimilar pair
    ).toDF("vec_id", "embedding")
    val kept = graft.operators.Dedup.semanticDedup(
      emb, "vec_id", "embedding", nClusters = 2, threshold = 0.995)
      .collect().map(_.getLong(0)).sorted.toSeq
    // 0.995: ids 1,2 (cos ~0.99995 to id 0) and the exact copy drop;
    // 5 and 6 (cos ~0.74) both survive
    assert(kept == Seq(0L, 5L, 6L), kept.toString)
    // deterministic across runs
    val again = graft.operators.Dedup.semanticDedup(
      emb, "vec_id", "embedding", nClusters = 2, threshold = 0.995)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(again == kept)
    // threshold 1.01 keeps everything (nothing reaches it)
    assert(graft.operators.Dedup.semanticDedup(
      emb, "vec_id", "embedding", nClusters = 2, threshold = 1.01).count() == 6)
  }

  test("embedding-cosine near-dup: LSH path finds exactly the planted pairs") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(7)
    // 40 well-separated random vectors + a perturbed near-dup of each
    val base = (0 until 40).map(i => (i.toLong, i % 4, Array.fill(dim)(rnd.nextGaussian())))
    val pert = base.map { case (id, lbl, v) =>
      (id + 1000, lbl, v.zip(v.reverse).map { case (a, b) => a + 0.1 * b })
    }
    val df = (base ++ pert).toSeq
      .toDF("vec_id", "label", "v")
      .select(col("vec_id"), col("label"), col("v").cast("array<double>").as("v"))
    val expected = base.map { case (id, _, _) => (id, id + 1000) }.toSet
    val lsh = Dedup.cosineDedupPairs(df, "vec_id", "v", dim, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == expected, s"LSH pairs ${lsh.size} != planted ${expected.size}")
    // exhaustive-blocked companion agrees (blocks contain the pairs)
    val blocked = Dedup.cosinePairsBlocked(df, "vec_id", "label", "v", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked == expected)
    // sanity: no false positives above threshold among non-planted pairs
    assert(!lsh.exists { case (a, b) => b - a != 1000 })
  }

  test("hot-bucket collapse preserves recall: identical content stays connected") {
    import spark.implicits._
    // 30 identical docs land in one degenerate LSH bucket > max size;
    // 4 distinct docs survive in small buckets
    val docs = ((0 until 30).map(i => (i.toLong, "the same boilerplate text repeated " * 3)) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta"),
        (101L, "alpha beta gamma delta epsilon zeta"),
        (102L, "one two three four five six seven"),
        (103L, "totally different content here entirely")))
      .toDF("id", "text")
    Dedup.skewDropsReset()
    val pairs = Dedup.minhashCandidates(docs, "id", "text", maxBucketSize = 8)
      .as[(Long, Long)].collect().toSet
    // the hot bucket is COLLAPSED, not dropped: the 30 identical docs
    // emit star edges to their min-id representative — every one of
    // them is still connected to the duplicate cluster
    assert(pairs.contains((100L, 101L)))
    assert((1 until 30).forall(i => pairs.contains((0L, i.toLong))),
      s"star edges missing from hot bucket: $pairs")
    // connectivity only (no quadratic blowup): member-member pairs of
    // the collapsed group are represented by their star edges
    assert(!pairs.contains((1L, 2L)))
    // nothing was silently lost: zero real drops, collapse is counted
    assert(Dedup.skewDrops.values.forall(_._1 == 0L),
      s"no reps should drop here: ${Dedup.skewDrops}")
    assert(Dedup.collapseStats.values.exists(_._1 >= 29L),
      s"collapse not reported: ${Dedup.collapseStats}")

    // simhash chunk join: identical docs -> identical simhash -> one
    // hot (chunk, value) bucket; every member must still reach the
    // duplicate cluster through its representative (hamming 0)
    Dedup.skewDropsReset()
    val sh = (0 until 20).map(i => (i.toLong, 0xdeadbeefL))
      .toDF("id", "sh")
    val capped = Dedup.simhashPairs(sh, maxHamming = 3, maxBucketSize = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == (1 until 20).map(i => (0L, i.toLong)).toSet,
      s"hot bucket must collapse to stars, got $capped")

    // PLANTED near-dup pairs inside an over-cap degenerate bucket are
    // still found: 12 docs share simhash H (hot at cap 5), two more sit
    // at hamming 1 and 2 from H — the representative pairs find them
    Dedup.skewDropsReset()
    val h = 0x0123456789abcdefL
    val planted = ((0 until 12).map(i => (i.toLong, h)) ++
      Seq((50L, h ^ 1L), (51L, h ^ 6L))).toDF("id", "sh")
    val found = Dedup.simhashPairs(planted, maxHamming = 3, maxBucketSize = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.contains((0L, 50L)) && found.contains((0L, 51L)) &&
      found.contains((50L, 51L)),
      s"planted near-dups inside the hot bucket were lost: $found")
    assert((1 until 12).forall(i => found.contains((0L, i.toLong))))
    // distinct-content representative OVERFLOW is the only real loss,
    // and it is WARN-counted, never silent: 9 distinct sh values
    // colliding in one bucket at cap 3 -> reps dropped and reported
    Dedup.skewDropsReset()
    val distincts = (0 until 9).map(i => (i.toLong, h ^ (1L << i)))
      .toDF("id", "sh") // all within hamming 2 of each other via h
    Dedup.simhashPairs(distincts, maxHamming = 3, maxBucketSize = 3).count()
    assert(Dedup.skewDrops.values.exists(_._1 > 0L),
      s"rep overflow must be counted: ${Dedup.skewDrops}")
  }

  test("skew/collapse metrics are EXACT under multi-branch evaluation") {
    import spark.implicits._
    // one hot bucket feeds BOTH join branches of bucketJoinPairs (the
    // stars branch and the rep-pairs branch each re-evaluate the reps
    // subplan) — r12's per-row accumulators over-counted 2-4× here;
    // the keyed last-write-wins accumulators must report the TRUE tally
    val banded = (
      // hot bucket (0, 100): 10 rows = 6 of content A + 4 distinct
      (0 until 6).map(i => (i.toLong, 0, 100L, 1L)) ++
        Seq((10L, 0, 100L, 2L), (11L, 0, 100L, 3L),
          (12L, 0, 100L, 4L), (13L, 0, 100L, 5L)) ++
        // cold bucket (0, 200): 2 rows, untouched by the guard
        Seq((20L, 0, 200L, 6L), (21L, 0, 200L, 7L))
      ).toDF("id", "band", "bh", "fk")
    // true tallies at cap 3: collapse = 10 rows − 5 groups = 5 in 1
    // bucket; reps = 5 groups > cap 3 → 2 dropped in 1 bucket
    Dedup.skewDropsReset()
    val pairs = Dedup.bucketJoinPairs(
      banded, Seq("band", "bh"), maxBucketSize = 3, fineKey = col("fk"))
    pairs.count()
    def totals(m: Map[String, (Long, Long)]): (Long, Long) =
      m.values.foldLeft((0L, 0L)) { case ((r, b), (r2, b2)) => (r + r2, b + b2) }
    assert(totals(Dedup.collapseStats) == ((5L, 1L)),
      s"collapse must be exact: ${Dedup.collapseStats}")
    assert(totals(Dedup.skewDrops) == ((2L, 1L)),
      s"drops must be exact: ${Dedup.skewDrops}")
    // a SECOND action over the same frame re-records the same keys —
    // still exact (last-write-wins, not cumulative double-count)
    pairs.count()
    assert(totals(Dedup.collapseStats) == ((5L, 1L)), Dedup.collapseStats.toString)
    assert(totals(Dedup.skewDrops) == ((2L, 1L)), Dedup.skewDrops.toString)

    // collapseHotBuckets (the probe-side guard): 8 rows in one hot
    // bucket = one group of 4 + four singletons → collapse 3, groups 5
    // > cap 3 → 2 dropped; evaluated through a self-union (two
    // branches) to prove branch-proofness there too
    Dedup.skewDropsReset()
    val banded2 = ((0 until 4).map(i => (i.toLong, 0, 100L, 1L)) ++
      Seq((10L, 0, 100L, 2L), (11L, 0, 100L, 3L),
        (12L, 0, 100L, 4L), (13L, 0, 100L, 5L)))
      .toDF("id", "band", "bh", "fk")
    val guarded = Dedup.collapseHotBuckets(
      banded2, Seq("band", "bh"), maxBucketSize = 3, col("fk"), "spec")
    guarded.unionAll(guarded).count()
    assert(totals(Dedup.collapseStats) == ((3L, 1L)),
      s"collapse must be exact across branches: ${Dedup.collapseStats}")
    assert(totals(Dedup.skewDrops) == ((2L, 1L)),
      s"drops must be exact across branches: ${Dedup.skewDrops}")

    // NULL key values must keep distinct bucket identities — both a
    // concat-based key (concat_ws skips nulls) AND a bare hash of the
    // key columns (Spark hash expressions skip null children) collide
    // (0L,null) with (null,0L) over SAME-typed keys onto one
    // accumulator entry, undercounting; the keys here are both LONG
    // on purpose so a skip-null key cannot pass by type accident
    Dedup.skewDropsReset()
    import org.apache.spark.sql.Row
    val nsch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("bh",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("fk",
        org.apache.spark.sql.types.LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val nullRows: java.util.List[Row] =
      ((0 until 5).map(i =>
        Row(i.toLong, java.lang.Long.valueOf(0L), null, i.toLong)) ++
        (10 until 15).map(i =>
          Row(i.toLong, null, java.lang.Long.valueOf(0L), i.toLong))).asJava
    val nullBanded = spark.createDataFrame(nullRows, nsch)
    Dedup.bucketJoinPairs(nullBanded, Seq("band", "bh"),
      maxBucketSize = 2, fineKey = col("fk")).count()
    // two hot buckets, 5 distinct contents each at cap 2 -> 3 dropped each
    assert(totals(Dedup.skewDrops) == ((6L, 2L)),
      s"null-keyed buckets must count separately: ${Dedup.skewDrops}")

    // a NULL fineKey group must not collide with a group whose
    // fineKey is the literal STRING "null" (Java string concat
    // renders a null as "null") — one hot bucket, two groups
    Dedup.skewDropsReset()
    val fksch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("bh",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("fk",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val fkRows: java.util.List[Row] =
      ((0 until 5).map(i => Row(i.toLong, 0L, 0L, null)) ++
        (10 until 14).map(i => Row(i.toLong, 0L, 0L, "null"))).asJava
    Dedup.bucketJoinPairs(spark.createDataFrame(fkRows, fksch),
      Seq("band", "bh"), maxBucketSize = 3, fineKey = col("fk")).count()
    // 9 rows, 2 groups: collapse = (5-1)+(4-1) = 7 in 1 bucket
    assert(totals(Dedup.collapseStats) == ((7L, 1L)),
      s"null fineKey must not collide with \"null\": ${Dedup.collapseStats}")
  }

  test("PII: counts and redaction cover every pattern, clean text untouched") {
    val s = "mail a.b+c@x-corp.io from 192.168.1.44, ssn 123-45-6789, " +
      "tel 555-123-4567 or 555.123.4567"
    assert(one(TA.piiCount(lit(s), "email")) == 1L)
    assert(one(TA.piiCount(lit(s), "ipv4")) == 1L)
    assert(one(TA.piiCount(lit(s), "ssn")) == 1L)
    assert(one(TA.piiCount(lit(s), "phone")) == 2L)
    val red = one(TA.redactPii(lit(s))).toString
    assert(red.contains("[EMAIL]") && red.contains("[IPV4]") &&
      red.contains("[SSN]") && red.contains("[PHONE]"))
    assert(!red.contains("@") && !red.contains("6789") && !red.contains("4567"))
    val clean = "no identifiers here, just words and the number 42"
    assert(one(TA.redactPii(lit(clean))) == clean)
  }

  test("repetition metrics: duplicates raise ratios, unique text is 0") {
    assert(one(TA.dupLineRatio(lit("a\nb\nc"))) == 0.0)
    // 4 non-empty lines, 2 distinct -> 0.5
    assert(one(TA.dupLineRatio(lit("x\ny\nx\ny"))) == 0.5)
    assert(one(TA.dupLineRatio(lit("\n \n"))) == 0.0) // only blank lines
    assert(one(TA.dupNgramRatio(lit("a b c d e"), 3)) == 0.0)
    // "a b a b a b": grams = (a b a, b a b, a b a, b a b) -> 2 dups of 4
    assert(one(TA.dupNgramRatio(lit("a b a b a b"), 3)) == 0.5)
  }

  test("contamination: planted benchmark overlap is flagged, corpus never shuffles") {
    import spark.implicits._
    val bench = Seq((900L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // full benchmark sentence embedded -> contaminated
      (1L, "intro words then the quick brown fox jumps over the lazy dog tonight and more"),
      // shares only a 7-gram -> NOT contaminated at w=8
      (2L, "quick brown fox jumps over the lazy cat sleeps"),
      (3L, "completely unrelated text with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val out = graft.operators.Contamination.flag(corpus, bench, "doc_id", "text", w = 8)
    val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 10-token bench sentence fully contained -> doc 1 hits all 3 bench 8-grams
    assert(rows == Map(1L -> 3L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side not broadcast:\n$plan")
  }

  test("sampling: deterministic fraction and exact per-source quotas") {
    import spark.implicits._
    val S = graft.operators.Sampling
    val df = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val a = S.sampleByFraction(df, "id", 0.3).select("id").collect().map(_.getLong(0)).toSet
    val b = S.sampleByFraction(df, "id", 0.3).repartition(13)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty) // partitioning-independent
    assert(math.abs(a.size - 300) < 60, s"fraction far off: ${a.size}")
    // nested fractions: the 0.1 sample is a subset of the 0.3 sample
    val c = S.sampleByFraction(df, "id", 0.1).select("id").collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
    val mixed = S.mixSources(df, "source", "id", quota = 25L)
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.values.toSet == Set(25L) && bySrc.size == 4)
    // quotas map: unlisted sources drop, listed cap exactly
    val mixed2 = S.mixSources(df, "source", "id",
      Map("src0" -> 5L, "src2" -> 250L))
    val bySrc2 = mixed2.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc2 == Map("src0" -> 5L, "src2" -> 250L))
    val plan = mixed2.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"quota table not broadcast:\n$plan")
  }

  test("mixSources: salted two-level rank matches the brute-force window, " +
    "stays exact under adversarial keys") {
    import spark.implicits._
    val S = graft.operators.Sampling
    // skewed corpus: one giant source, one tiny source, some null sources
    val rows = (0L until 5000L).map(i => (i, "big")) ++
      (5000L until 5010L).map(i => (i, "tiny")) ++
      (5010L until 5020L).map(i => (i, null: String))
    val df = rows.toDF("id", "source")
    def key(id: Long) = ((id * 48271L) % 2147483647L) * 48271L % 2147483647L
    // brute-force oracle: per-source smallest (key, id) up to quota
    def oracle(quota: Long): Set[Long] = rows.groupBy(_._2).flatMap { case (_, rs) =>
      rs.map(_._1).sortBy(i => (key(i), i)).take(quota.toInt)
    }.toSet
    val got = S.mixSources(df, "source", "id", quota = 30L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == oracle(30L), "thresholded selection diverged from brute force")
    // adversarial ids: ALL sample keys concentrated at the top of the
    // range — any probabilistic pre-filter would starve; the two-level
    // rank must still return exactly `quota` rows, the right ones
    val adv = (0L until 100000L).filter(i => key(i) > 2100000000L).take(400)
    assert(adv.size == 400, s"not enough adversarial ids: ${adv.size}")
    val advDf = adv.map(i => (i, "hot")).toDF("id", "source")
    val hot = S.mixSources(advDf, "source", "id", quota = 7L)
      .select("id").collect().map(_.getLong(0)).toSet
    val hotOracle = adv.sortBy(i => (key(i), i)).take(7).toSet
    assert(hot == hotOracle, "shortfall guard lost exactness")
  }

  test("mixSourcesApprox: cutoff selection lands within 5% of each quota " +
    "with no window stages; unlisted sources drop; quota >= count keeps all") {
    import spark.implicits._
    val S = graft.operators.Sampling
    val rows = (0L until 40000L).map(i => (i, s"src${i % 2}")) ++
      (40000L until 40050L).map(i => (i, "small"))
    val df = rows.toDF("id", "source")
    val out = S.mixSourcesApprox(df, "source", "id",
      Map("src0" -> 2000L, "src1" -> 500L, "small" -> 1000L))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet == Set("src0", "src1", "small"), bySrc.toString)
    assert(math.abs(bySrc("src0") - 2000L) <= 100, s"src0: ${bySrc("src0")}")
    assert(math.abs(bySrc("src1") - 500L) <= 25, s"src1: ${bySrc("src1")}")
    assert(bySrc("small") == 50L, "quota over count keeps everything")
    // the selection is a cutoff on the SAME key order the exact form
    // uses: the approx pick is a prefix-superset relationship — every
    // exactly-selected row whose key is under the cutoff is included
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"approx mode must not sort-rank:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"cutoff table not broadcast:\n$plan")
    // deterministic: a re-run selects the identical row set
    val out2 = S.mixSourcesApprox(df, "source", "id",
      Map("src0" -> 2000L, "src1" -> 500L, "small" -> 1000L))
    assert(out.select("id").collect().map(_.getLong(0)).toSet ==
      out2.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("mixing.approx-above flips mixSources to the approx path only past " +
    "the threshold; exact stays the default") {
    import spark.implicits._
    val S = graft.operators.Sampling
    val df = (0L until 20000L).map(i => (i, s"src${i % 2}")).toDF("id", "source")
    val quotas = Map("src0" -> 1000L, "src1" -> 200L)
    // no option / below threshold: exact (windowed) path, counts exact
    val exact = S.mixSources(df, "source", "id", quotas, Map.empty[String, String])
    assert(exact.queryExecution.executedPlan.toString.contains("Window"))
    val exactBySrc = exact.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exactBySrc == quotas, exactBySrc.toString)
    val below = S.mixSources(df, "source", "id", quotas,
      Map("mixing.approx-above" -> "5000"))
    assert(below.queryExecution.executedPlan.toString.contains("Window"),
      "quotas under the threshold must keep the exact rank")
    // any quota past the threshold: approx path — no window stages,
    // counts within tolerance
    val approx = S.mixSources(df, "source", "id", quotas,
      Map("mixing.approx-above" -> "500"))
    val aplan = approx.queryExecution.executedPlan.toString
    assert(!aplan.contains("Window"), s"approx mode must not sort-rank:\n$aplan")
    val aBySrc = approx.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(aBySrc("src0") - 1000L) <= 50, aBySrc.toString)
    assert(math.abs(aBySrc("src1") - 200L) <= 10, aBySrc.toString)
  }

  test("removeFrequentLines: boilerplate drops, order restores, empty docs drop") {
    import spark.implicits._
    val boiler = "ACCEPT COOKIES"
    val docs = Seq(
      (1L, s"alpha\n$boiler\nbeta"),
      (2L, s"$boiler\ngamma"),
      (3L, s"delta\n$boiler"),
      (4L, boiler), // entirely boilerplate → dropped
      (5L, s"z last\n$boiler\na first") // order is positional, not sorted
    ).toDF("id", "text")
    val out = TA.removeFrequentLines(docs, "id", "text", maxDocFreq = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "alpha\nbeta", 2L -> "gamma", 3L -> "delta",
      5L -> "z last\na first"), out)
    // threshold is inclusive: df == maxDocFreq keeps the line
    val keep = TA.removeFrequentLines(docs, "id", "text", maxDocFreq = 5L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keep(4L) == boiler, keep)
    // custom separator with regex metacharacters
    val dot = Seq((1L, "a|x|b"), (2L, "x|c"), (3L, "x")).toDF("id", "text")
    val outDot = TA.removeFrequentLines(dot, "id", "text", 2L, sep = "|")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(outDot == Map(1L -> "a|b", 2L -> "c"), outDot)
  }

  test("UrlCuration: normalization, registered domain, per-domain cap") {
    import spark.implicits._
    val U = graft.operators.UrlCuration
    def norm(s: String): String =
      Seq(s).toDF("u").select(U.normalizeUrl(col("u"))).head.getString(0)
    // scheme/host lowercase, path case preserved
    assert(norm("HTTPS://Example.COM/Path/X") == "https://example.com/Path/X")
    // default ports strip; non-default ports stay
    assert(norm("https://a.com:443/x") == "https://a.com/x")
    assert(norm("http://a.com:80") == "http://a.com")
    assert(norm("https://a.com:8443/x") == "https://a.com:8443/x")
    assert(norm("http://a.com:443/x") == "http://a.com:443/x")
    // fragments drop
    assert(norm("https://a.com/x#frag") == "https://a.com/x")
    // utm params: leading, trailing, multiple, only
    assert(norm("https://a.com/x?utm_source=t&id=3") == "https://a.com/x?id=3")
    assert(norm("https://a.com/x?id=3&utm_source=t") == "https://a.com/x?id=3")
    assert(norm("https://a.com/x?utm_a=1&utm_b=2&id=3") == "https://a.com/x?id=3")
    assert(norm("https://a.com/x?utm_a=1") == "https://a.com/x")
    // trailing slash / separators
    assert(norm("https://a.com/x/") == "https://a.com/x")
    assert(norm("https://a.com/x?id=3&") == "https://a.com/x?id=3")
    // garbage passes through non-null
    assert(norm("not a url") == "not a url")

    def dom(h: String): String = Seq(h).toDF("h")
      .select(U.registeredDomain(col("h"))).head.getString(0)
    assert(dom("www.example.com") == "example.com")
    assert(dom("a.b.example.co.uk") == "example.co.uk")
    assert(dom("example.com") == "example.com")
    assert(dom("localhost") == "localhost")
    assert(dom("deep.sub.gov.uk") == "sub.gov.uk")
    def host(u: String): String = Seq(u).toDF("u")
      .select(U.hostOf(col("u"))).head.getString(0)
    assert(host("https://User:p@Www.EX.com:8080/a?b#c") == "www.ex.com")

    // per-domain cap: deterministic top-N by sample key, exact counts
    val rows = (0L until 300L).map(i =>
      (i, s"https://host${i % 3}.example.com/p/$i")) ++
      (300L until 310L).map(i => (i, s"https://tiny.other.org/p/$i"))
    val df = rows.toDF("id", "url")
    val capped = U.capPerDomain(df, "url", "id", cap = 20L)
    val byDom = capped.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // all three hostN hosts share the registered domain example.com
    assert(byDom == Map("example.com" -> 20L, "other.org" -> 10L), byDom)
    // selection matches the brute-force sample-key order
    def key(id: Long) = ((id * 48271L) % 2147483647L) * 48271L % 2147483647L
    val expect = (0L until 300L).sortBy(i => (key(i), i)).take(20).toSet ++
      (300L until 310L)
    assert(capped.select("id").collect().map(_.getLong(0)).toSet == expect)
    // exact URL dedup after normalization
    val dups = Seq(
      (1L, "https://A.com/x?utm_s=1"), (2L, "https://a.com/x"),
      (3L, "https://a.com/y")).toDF("id", "url")
    val dd = U.dedupByUrl(dups, "url", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(dd == Set(("https://a.com/x", 1L, 2L), ("https://a.com/y", 3L, 1L)))
  }

  test("packSequences: spans match a serial cum-sum, even under coalesce(1)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0L until 300L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))).toDF("id", "text")
    val out = TA.packSequences(docs, "id", "text", 100L, partitions = 7)
    // serial oracle
    val lens = docs.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").length.toLong))
    var cum = 0L
    val expected = lens.map { case (id, n) =>
      val first = cum / 100L
      val last = (cum + n - 1L) / 100L
      cum += n
      (id, n, first, last)
    }.toSeq
    // plain collect AND through coalesce(1) — the single-task fusion
    // must not reset per-partition offsets (regression: TaskContext
    // partition ids collapse to 0 under coalesce)
    val got = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    val gotCoalesced = TA.packSequences(docs, "id", "text", 100L, partitions = 7)
      .coalesce(1).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotCoalesced == expected)
    // spans are contiguous across the corpus: doc i's first_pack is
    // doc i-1's last_pack or that plus one
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 == a._4 || b._3 == a._4 + 1)
    case _ => }
  }

  test("substring dedup: maximal spans and first-occurrence stripping") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),          // shares "a b c d" with doc 2
      (2L, "x y a b c d z"),
      (3L, "q w e r"),              // no duplication
      (4L, "m n o m n o m n o"),    // within-doc repetition
      (5L, "a b c"),                // whole doc duplicated (of 1/2/6)
      (6L, "a b c")
    ).toDF("id", "text")

    val spans = Dedup.duplicatedSpans(docs, "id", "text", k = 3)
      .as[(Long, Long, Long)].collect().toSet
    // adjacent duplicated 3-gram positions merge into maximal spans
    assert(spans == Set(
      (1L, 1L, 4L),  // grams "a b c"@1, "b c d"@2 → tokens 1..4
      (2L, 3L, 6L),  // same grams at positions 3,4 → tokens 3..6
      (4L, 1L, 9L),  // every position duplicated within the doc
      (5L, 1L, 3L), (6L, 1L, 3L)), spans.toString)

    val stripped = Dedup.stripDuplicateSpans(docs, "id", "text", k = 3)
      .as[(Long, String)].collect().toMap
    assert(stripped.size == 6, "every input doc must come back")
    // the globally-first occurrence (min doc, then position) survives
    assert(stripped(1L) == "a b c d e f")
    assert(stripped(2L) == "x y z")       // tokens 3..6 cut
    assert(stripped(3L) == "q w e r")     // untouched
    assert(stripped(4L) == "m n o")       // repeats collapsed to one copy
    assert(stripped(5L) == "" && stripped(6L) == "") // fully cut, kept as empty
    // stripping leaves no cross-doc duplicated k-grams behind except
    // the single surviving copy of each
    val after = Dedup.duplicatedSpans(
      stripped.toSeq.toDF("id", "text"), "id", "text", k = 3).count()
    assert(after == 0L, s"stripping left $after duplicated spans")
  }

  test("linear classifier: zero weights give 0.5; weights shift scores monotonically") {
    import spark.implicits._
    val docs = Seq((1L, "good solid text"), (2L, "bad junk")).toDF("id", "text")
    val dims = 64
    val zero = spark.range(0, dims).select(col("id").as("bucket"),
      lit(0.0).as("weight"))
    val s0 = TA.linearClassifierScore(docs, "id", "text", zero, dims, bias = 0.0)
      .collect().map(_.getDouble(1))
    assert(s0.forall(s => math.abs(s - 0.5) < 1e-12), s0.toSeq.toString)
    // uniform positive weights push every score above 0.5, uniform
    // negative below — pooling is a mean, so doc length cancels
    val pos = spark.range(0, dims).select(col("id").as("bucket"), lit(1.0).as("weight"))
    val sp = TA.linearClassifierScore(docs, "id", "text", pos, dims, bias = 0.0)
      .collect().map(_.getDouble(1))
    assert(sp.forall(s => math.abs(s - 1.0 / (1.0 + math.exp(-1.0))) < 1e-12))
    // bias shifts alone
    val sb = TA.linearClassifierScore(docs, "id", "text", zero, dims, bias = 2.0)
      .collect().map(_.getDouble(1))
    assert(sb.forall(s => math.abs(s - 1.0 / (1.0 + math.exp(-2.0))) < 1e-12))
  }

  test("splitAssign: deterministic, growth-stable, proportional") {
    import spark.implicits._
    import graft.operators.Sampling
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = spark.range(0, 1000).toDF("id")
    val big = spark.range(0, 10000).toDF("id")
    val a1 = Sampling.splitAssign(small, "id", splits)
      .as[(Long, String)].collect().toMap
    // growing the corpus NEVER migrates an existing id between splits
    val a2 = Sampling.splitAssign(big, "id", splits)
      .as[(Long, String)].collect().toMap
    assert(a1.forall { case (id, s) => a2(id) == s })
    // proportions land near the weights
    val counts = a2.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 8000) < 400, counts.toString)
    assert(math.abs(counts("val") - 1000) < 200, counts.toString)
    assert(math.abs(counts("test") - 1000) < 200, counts.toString)
    // un-normalized weights normalize
    val b = Sampling.splitAssign(small, "id", Seq("a" -> 3.0, "b" -> 1.0))
      .as[(Long, String)].collect().toMap
    assert(math.abs(b.values.count(_ == "a") - 750) < 100)
    intercept[IllegalArgumentException](
      Sampling.splitAssign(small, "id", Seq("x" -> 0.0)))
  }

  test("incremental dedup == one-shot dedup over the union") {
    import spark.implicits._
    import graft.operators.Dedup
    def doc(i: Long, base: String) = (i, (1 to 30).map(j => s"$base$j").mkString(" "))
    // docs 1/2 near-identical (share all tokens), 3 distinct; batch2
    // brings 11 (dup of 1), 12 (distinct), 13 (dup of 12's text? no—dup of 3)
    val batch1 = Seq(doc(1, "a"), doc(2, "a"), doc(3, "z")).toDF("id", "text")
    val batch2 = Seq(doc(11, "a"), doc(12, "q"), doc(13, "z")).toDF("id", "text")

    val oneShot = Dedup.minhashDedupPairs(
      batch1.unionAll(batch2), "id", "text", threshold = 0.9, k = 16, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    val dir = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    val idx = Dedup.createBandIndex(spark, s"$dir/idx", buckets = 2)
    Dedup.appendToBandIndex(idx, batch1, "id", "text", k = 16, bands = 4)
    val within1 = Dedup.minhashDedupPairs(
      batch1, "id", "text", threshold = 0.9, k = 16, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val incPairs = Dedup.dedupIncrementPairs(idx, batch1, batch2,
      "id", "text", threshold = 0.9, k = 16, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet

    assert(within1 ++ incPairs == oneShot,
      s"one-shot $oneShot vs incremental ${within1 ++ incPairs}")
    // the cross-batch dups specifically came through the INDEX
    assert(incPairs.contains((1L, 11L)) && incPairs.contains((3L, 13L)))

    // a second increment probes the grown index
    Dedup.appendToBandIndex(idx,
      batch2.join(Seq(11L, 13L).toDF("id"), Seq("id"), "left_anti"),
      "id", "text", k = 16, bands = 4)
    val batch3 = Seq(doc(21, "q")).toDF("id", "text")
    val inc3 = Dedup.dedupIncrementPairs(idx, batch1.unionAll(batch2), batch3,
      "id", "text", threshold = 0.9, k = 16, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(inc3 == Set((12L, 21L)), s"got $inc3")
  }

  test("incremental dedup: over-cap increment buckets still reach corpus matches") {
    import spark.implicits._
    import graft.operators.Dedup
    def doc(i: Long, base: String) = (i, (1 to 30).map(j => s"$base$j").mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("graft-incskew").toString
    val idx = Dedup.createBandIndex(spark, s"$dir/idx", buckets = 2)
    val corpus = Seq(doc(1L, "dup"), doc(2L, "other")).toDF("id", "text")
    Dedup.appendToBandIndex(idx, corpus, "id", "text", k = 16, bands = 4)
    // 20 identical increment docs duplicate corpus doc 1 — far past the
    // cap of 3, so their band buckets are HOT. The collapse must still
    // surface the corpus match (rep probes the index) and keep every
    // member connected through the within-increment stars.
    val inc = (100L until 120L).map(i => doc(i, "dup")).toDF("id", "text")
    Dedup.skewDropsReset()
    val pairs = Dedup.dedupIncrementPairs(idx, corpus, inc,
      "id", "text", threshold = 0.9, k = 16, bands = 4, maxBucketSize = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the representative's corpus hit is present…
    assert(pairs.exists { case (a, b) => a == 1L || b == 1L },
      s"corpus match lost in the hot bucket: $pairs")
    // …and every member is connected to the duplicate cluster
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def component(seed: Long): Set[Long] = {
      var seen = Set(seed); var frontier = Set(seed)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    val cluster = component(1L)
    assert((100L until 120L).forall(cluster.contains),
      s"members disconnected from the corpus duplicate: $cluster")
    // nothing silently lost: collapse counted, zero real drops
    assert(Dedup.collapseStats.values.exists(_._1 > 0L))
    assert(Dedup.skewDrops.values.forall(_._1 == 0L), Dedup.skewDrops.toString)
  }

  test("DSIR importance weights: target-only tokens outrank raw-only, " +
    "hashed path agrees with exact on a collision-free vocabulary") {
    import graft.operators.Sampling
    import spark.implicits._
    // 40 docs: ids 0-19 speak the TARGET dialect, 20-39 a disjoint one.
    // Target corpus = the first dialect, so its tokens carry weight
    // ~1e6·(ct+1)/(cr+1) ≈ 1e6 while the other dialect's sit at
    // ~1e6/(cr+1).
    val docs = (0L until 40L).map { i =>
      val dialect = if (i < 20) "alpha beta gamma" else "delta epsilon zeta"
      (i, s"$dialect tok$i")
    }.toDF("id", "text")
    val target = docs.filter($"id" < 20)
    val w = Sampling.importanceWeights(docs, target, "text")
    val exact = Sampling.importanceScores(docs, "id", "text", w)
      .as[(Long, Long)].collect().toMap
    // every target-dialect doc outscores every other-dialect doc
    val loTarget = (0L until 20L).map(exact).min
    val hiOther = (20L until 40L).map(exact).max
    assert(loTarget > hiOther, s"$loTarget vs $hiOther")
    // hashed path: 2^16 buckets over a ~46-token vocabulary — collision
    // probability per pair ~46²/2/65536 ≈ 1.6%; the planted seedless
    // vocabulary here happens collision-free, so scores match exactly
    val hashed = Sampling.importanceScoresHashed(docs, target, "id", "text")
      .as[(Long, Long)].collect().toMap
    assert(hashed == exact, "hashed scores diverged from exact")
    // resampling: saturated scores always keep; zero scores keep ~never
    val kept = Sampling.importanceResample(
        docs.join(exact.toSeq.toDF("id", "iw_score"), "id"),
        "id", "iw_score", cap = loTarget)
      .select("id").as[Long].collect().toSet
    assert((0L until 20L).forall(kept.contains), s"saturated doc dropped: $kept")
    // determinism: second run selects the identical set
    val kept2 = Sampling.importanceResample(
        docs.join(exact.toSeq.toDF("id", "iw_score"), "id"),
        "id", "iw_score", cap = loTarget)
      .select("id").as[Long].collect().toSet
    assert(kept2 == kept)
  }

  test("DSIR hashed bigram features rank word ORDER, unigrams cannot") {
    import spark.implicits._
    import graft.operators.Sampling
    // target phrase vs its scrambled permutation: identical unigram
    // sets, so unigram features tie them — bigram features must rank
    // the in-order doc strictly above the scrambled one
    val target = (0 until 30).map(i => (100L + i, "new york city hall"))
      .toDF("id", "text")
    val docs = Seq(
      (1L, "new york city hall report"),
      (2L, "hall city york new report"), // scrambled, same unigrams
      (3L, "unrelated filler words entirely")).toDF("id", "text")
    val uni = Sampling.importanceScoresHashed(docs, target, "id", "text",
      nGrams = 1).as[(Long, Long)].collect().toMap
    assert(uni(1L) == uni(2L), s"unigram features should tie: $uni")
    val bi = Sampling.importanceScoresHashed(docs, target, "id", "text",
      nGrams = 2)
    val biMap = bi.as[(Long, Long)].collect().toMap
    assert(biMap(1L) > biMap(2L), s"bigrams must rank order: $biMap")
    assert(biMap(2L) > biMap(3L), s"shared unigrams still count: $biMap")
    // the scale contract survives the feature order: the weight table
    // stays broadcast on the wide side
    val plan = bi.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"hashed weight join must stay broadcast:\n$plan")
    // empty docs still score 0 through the sentinel at order 2
    val withEmpty = Sampling.importanceScoresHashed(
      docs.union(Seq((9L, "")).toDF("id", "text")), target, "id", "text",
      nGrams = 2).as[(Long, Long)].collect().toMap
    assert(withEmpty(9L) == 0L)
  }

  test("Gopher rules: each rule fails in isolation on a crafted doc") {
    import spark.implicits._
    // A baseline doc that passes every rule: 60 alphabetic words
    // including two required stop words, one plain line.
    val good = (Seq("the", "with") ++ Seq.fill(58)("words")).mkString(" ")
    val docs = Seq(
      ("good", good),
      ("too_short", "the with words"),                          // rule 1
      ("long_words", (Seq("the", "with") ++
        Seq.fill(58)("absolutelyoverlong")).mkString(" ")),      // rule 2
      ("symbols", good + " " + Seq.fill(9)("#").mkString(" ")), // rule 3
      ("bullets", good + ("\n- b" * 19)),                        // rule 4
      ("ellipsis", good + "\nend...\nend..."),                   // rule 5
      ("numeric", (Seq("the", "with") ++ Seq.fill(10)("words") ++
        Seq.fill(48)("12345")).mkString(" ")),                   // rule 6
      ("no_stops", Seq.fill(60)("words").mkString(" "))          // rule 7
    ).toDF("id", "text")
    val flags = docs.select(col("id"),
        TA.gopherQualityFlags(col("text")).as("g"))
      .select(col("id"), col("g.*"))
      .collect().map(r => r.getString(0) ->
        (1 until r.length).map(r.getBoolean)).toMap
    val ruleIdx = Map("too_short" -> 0, "long_words" -> 1, "symbols" -> 2,
      "bullets" -> 3, "ellipsis" -> 4, "numeric" -> 5, "no_stops" -> 6)
    assert(flags("good").forall(identity), s"good doc failed: ${flags("good")}")
    ruleIdx.foreach { case (id, i) =>
      assert(!flags(id)(i), s"$id should fail rule $i: ${flags(id)}")
      assert(!flags(id).last, s"$id should not keep")
      // and the OTHER rules still pass (isolation)
      (0 until 7).filter(_ != i).foreach { j =>
        assert(flags(id)(j), s"$id unexpectedly failed rule $j: ${flags(id)}")
      }
    }
  }

  test("BPE learning: greedy overlap semantics, tie-break, early stop, " +
    "encode round-trip") {
    import graft.operators.Bpe
    import spark.implicits._
    // 'aaaa' ×2: round 1 counts OVERLAPPING (a,a) pairs — 3 per word,
    // 6 total; greedy application yields [aa,aa]; round 2 merges
    // (aa,aa) with count 2; round 3 finds a single symbol — early stop.
    val runs = Seq((1L, "aaaa aaaa")).toDF("id", "text")
    val m = Bpe.learnMerges(runs, "text", numMerges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)), m.toString)
    // tie-break: 'ab' and 'aa' both appear once — (a,a) and (a,b) tie
    // at 1, (a,a) wins on the (left, right) order
    val tie = Seq((1L, "ab aa")).toDF("id", "text")
    val t = Bpe.learnMerges(tie, "text", numMerges = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(t == Seq((1, "a", "a", 1L)), t.toString)
    // encode applies merges in rank order within word boundaries and
    // conserves content: concatenating tokens re-yields each word
    val enc = Bpe.encode(Seq((1L, "aaaa aab ba")).toDF("id", "text"),
      "text", Seq("a" -> "a", "aa" -> "aa"))
      .select("bpe_tokens").as[Seq[String]].head()
    assert(enc == Seq("aaaa", "aa", "b", "b", "a"), enc.toString)
    assert(enc.mkString == "aaaaaabba")
  }
}
