package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis => TA}

/** Training-data pipeline operators (dedup / text analysis / similarity
  * search) as verified inventory entries over `documents` and
  * `embeddings`. SQL-expressible variants carry DuckDB oracles; the
  * hash-based ones (MinHash/SimHash/LSH) are deterministic but not
  * SQL-expressible → rows-only checks, with exact-verified companions.
  */
object Pipeline {

  val defs: Vector[QDef] = Vector(
    // ---- exact dedup (hash-groupBy on full text).
    QDef(
      "p01_exact_dedup",
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY text""".stripMargin) { (s, dir) =>
      Dedup.exact(tbl(s, dir, "documents"), "doc_id", col("text"))
        .select(col("canonical_id"), col("n_copies"))
    },

    // ---- token / char counting.
    QDef(
      "p02_token_stats",
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_measured,
        |  n_chars AS n_chars_meta
        |FROM documents""".stripMargin) { (s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          TA.tokenCount(col("text")).as("n_tokens"),
          TA.charCount(col("text")).as("n_chars_measured"),
          col("n_chars").as("n_chars_meta"))
    },

    // ---- quality scoring (C4/Gopher-style heuristics).
    QDef(
      "p03_quality_scores",
      """SELECT doc_id,
        |  round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        |    / greatest(length(text), 1), 6) AS alpha_ratio,
        |  round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |    / greatest(length(text), 1), 6) AS digit_ratio,
        |  round(CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |    / greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1), 6) AS avg_word_len
        |FROM documents""".stripMargin) { (s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          round(TA.alphaRatio(col("text")), 6).as("alpha_ratio"),
          round(TA.digitRatio(col("text")), 6).as("digit_ratio"),
          round(TA.avgWordLen(col("text")), 6).as("avg_word_len"))
    },

    // ---- language ID, held to an EXACT oracle via planted markers
    // (the p05/p06 trick): every 25th document's text is replaced by a
    // deterministic marker for language langMarkers[(doc_id/25) % 16]
    // — each marker provably classifies as its language (script range
    // or strict-argmax stopword profile), so the expected label is
    // plain SQL. Covers every classifier branch: 7 script shortcuts,
    // 8 stopword profiles, und fallback.
    QDef(
      "p04_langid", {
        val codes = TA.langMarkers.map("'" + _._1 + "'").mkString("[", ", ", "]")
        s"""SELECT doc_id,
           |  list_extract($codes, CAST((doc_id // 25) % ${TA.langMarkers.size} AS BIGINT) + 1) AS pred_lang
           |FROM documents WHERE doc_id % 25 = 0""".stripMargin
      }) { (s, dir) =>
      val markers = array(TA.langMarkers.map(m => lit(m._2)): _*)
      tbl(s, dir, "documents")
        .filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"),
          element_at(markers,
            expr(s"int((doc_id div 25) % ${TA.langMarkers.size}) + 1")).as("text"))
        .select(col("doc_id"), TA.langId(col("text")).as("pred_lang"))
    },

    // ---- MinHash+LSH near-dup, held to an EXACT oracle: the gate
    // plants an exact duplicate (doc_id + 1_000_000) of every 10th
    // document. Identical text → identical signature → the pair shares
    // EVERY band, so candidate generation is guaranteed by
    // construction (deterministic, not probabilistic), and the verify
    // step scores Jaccard 1.0 >= threshold. The output is the planted
    // containment set, which the oracle states in plain SQL: a missed
    // candidate, signature drift, banding bug, or broken verifier
    // drops rows and fails the hash compare. (Pair-distance 1_000_000
    // uniquely identifies planted pairs: natural doc ids stay far
    // below 1_000_000.)
    QDef(
      "p05_minhash_dedup",
      """SELECT CAST(doc_id AS BIGINT) AS src_id, TRUE AS dup_found
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin) { (s, dir) =>
      val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val pairs = Dedup.minhashDedupPairs(docs.unionAll(planted),
        "doc_id", "text", threshold = 0.7)
      val found = pairs.filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a").as("src_id"))
      docs.filter(col("doc_id") % 10 === 0).select(col("doc_id").as("src_id"))
        .join(found, Seq("src_id"), "left_semi")
        .select(col("src_id"), lit(true).as("dup_found"))
    },

    // ---- SimHash near-dup, held to an EXACT oracle the same way as
    // p05: planted exact duplicates have identical simhash (Hamming 0
    // <= maxHamming) and share every chunk bucket, so the pigeonhole
    // blocking finds them deterministically. maxHamming=7 → 8 chunks
    // of 8 bits, buckets wide enough to stay under the skew guard.
    QDef(
      "p06_simhash_dedup",
      """SELECT CAST(doc_id AS BIGINT) AS src_id, TRUE AS dup_found
        |FROM documents WHERE doc_id % 7 = 0""".stripMargin) { (s, dir) =>
      val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val pairs = Dedup.simhashDedupPairs(docs.unionAll(planted),
        "doc_id", "text", maxHamming = 7)
      val found = pairs.filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a").as("src_id"))
      docs.filter(col("doc_id") % 7 === 0).select(col("doc_id").as("src_id"))
        .join(found, Seq("src_id"), "left_semi")
        .select(col("src_id"), lit(true).as("dup_found"))
    },

    // ---- exact word-set Jaccard pairs within a blocking key (SQL-
    // verifiable companion to p05: same verifier, exhaustive within
    // `source` blocks).
    QDef(
      "p07_jaccard_pairs_blocked",
      """WITH sets AS (SELECT doc_id, source,
        |    list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / greatest(len(list_distinct(list_concat(a.toks, b.toks))), 1), 6) AS jaccard
        |FROM sets a JOIN sets b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / greatest(len(list_distinct(list_concat(a.toks, b.toks))), 1) >= 0.8""".stripMargin) { (s, dir) =>
      // inverted-index formulation: |A∩B| via a postings self-join +
      // count, |A∪B| = |A|+|B|-|A∩B| — joins and aggregates stay in
      // whole-stage codegen, pairs sharing no token never materialize,
      // and the per-pair interpreted array ops of the naive form are
      // gone. The DuckDB oracle computes the same pairs set-wise.
      val docs = tbl(s, dir, "documents")
        .select(col("doc_id"), col("source"), Dedup.tokenSet(col("text")).as("toks"))
        .withColumn("nt", size(col("toks")))
      val inv = docs.select(col("source"), col("doc_id"), col("nt"),
        explode(col("toks")).as("t"))
      val a = inv.select(col("source"), col("t"),
        col("doc_id").as("id_a"), col("nt").as("na"))
      val b = inv.select(col("source"), col("t"),
        col("doc_id").as("id_b"), col("nt").as("nb"))
      // ONE threshold constant drives both the prefilter and the final
      // cut (r18, was duplicated as 4/5 vs 0.8 — a threshold change
      // would have silently broken the prefilter's soundness). The
      // prefilter stays INTEGER arithmetic, derived from the constant:
      // it lands in the pair join's condition and is evaluated per
      // candidate pair, where a per-row double cast measurably
      // regressed the gate (r18 window: 4.9 -> 6.9 s with
      // `na >= nb * 0.8` doubles; na*10 >= nb*8 is the exact same
      // predicate over longs).
      val jaccThreshold = 0.8
      val den = 10L
      val num = (jaccThreshold * den).toLong
      require(num.toDouble == jaccThreshold * den,
        s"jaccThreshold must be a one-decimal rational, got $jaccThreshold")
      a.join(b, Seq("source", "t"))
        .filter(col("id_a") < col("id_b"))
        // r17: size-ratio prefilter — J = |∩|/|∪| ≤ min(na,nb)/max(na,nb),
        // so any pair with max·threshold > min can never reach the
        // threshold; dropping it BEFORE the count aggregate shrinks the
        // aggregate's input without changing the result (guide §2.3:
        // shuffle/aggregate fewer rows)
        .filter(col("na") * den >= col("nb") * num &&
          col("nb") * den >= col("na") * num)
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(count(lit(1)).as("common"))
        .withColumn("jacc_raw",
          col("common").cast("double") /
            greatest(col("na") + col("nb") - col("common"), lit(1)).cast("double"))
        .filter(col("jacc_raw") >= jaccThreshold)
        .select(col("id_a"), col("id_b"), round(col("jacc_raw"), 6).as("jaccard"))
    },

    // ---- document fingerprints, held to an EXACT oracle: the
    // xxhash64 values themselves are not SQL-expressible in DuckDB,
    // but their defining properties on this dataset are — every text
    // group carries exactly one (fingerprint, min-shingle-fp) pair
    // (determinism) and distinct texts get distinct fingerprints
    // (injectivity here; a collision or drift flips the boolean and
    // fails the hash compare).
    QDef(
      "p08_fingerprints",
      """SELECT CAST(min(doc_id) AS BIGINT) AS canonical_id,
        |  CAST(count(*) AS BIGINT) AS n_members, TRUE AS fp_consistent
        |FROM documents GROUP BY text""".stripMargin) { (s, dir) =>
      val fp = tbl(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TA.docFingerprint(col("text")).as("fp"),
          TA.minShingleFingerprint(col("text")).as("msfp"))
      val groups = fp.groupBy(col("text"))
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_members"),
          (count_distinct(col("fp")) === 1 &&
            count_distinct(col("msfp")) === 1).as("within_ok"))
      val global = fp.agg(
        (count_distinct(col("fp")) === count_distinct(col("text")))
          .as("injective_ok"))
      groups.crossJoin(global)
        .select(col("canonical_id"), col("n_members"),
          (col("within_ok") && col("injective_ok")).as("fp_consistent"))
    },

    // ---- brute-force exact k-NN by cosine over embeddings.
    QDef(
      "s01_knn_bruteforce",
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    round(
        |      list_sum(list_transform(generate_series(1, 64),
        |        i -> CAST(qvec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |           i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(generate_series(1, 64),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
        |    , 6) AS cosine
        |  FROM q, embeddings e WHERE e.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
        |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", kNeighbors = 5)
    },

    // ---- LSH-bucketed approximate k-NN (the at-scale path). The gate
    // is a RECALL check against the exact brute-force top-k: seeds are
    // fixed, so the per-query recall@5 — and the >= 0.8 boolean — is
    // deterministic and oracle-checkable. A broken LSH (hash drift,
    // candidate loss) flips booleans and fails the hash compare.
    QDef(
      "s02_knn_lsh",
      """SELECT DISTINCT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      val approx = Similarity.lshTopK(emb, q, "vec_id", "embedding",
        dim = 64, kNeighbors = 5, tables = 16, planesPerTable = 3)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      Similarity.recallOk(approx, exact, threshold = 0.8)
    },

    // ---- IVF ANN: distributed Lloyd-trained lists + nProbe probing,
    // recall-gated against brute force (deterministic init).
    QDef(
      "s03_knn_ivf",
      """SELECT DISTINCT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      val approx = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
        dim = 64, kNeighbors = 5, nProbe = 6)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      Similarity.recallOk(approx, exact, threshold = 0.7)
    },

    // ---- persisted IVF index: train ONCE into centroid + list-
    // partitioned assignment parquet, then query with zero training
    // jobs — the amortized ANN path (reference role: paimon-faiss
    // global vector indexes). Recall-gated like s03.
    QDef(
      "s04_knn_ivf_index",
      """SELECT DISTINCT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-s04-ivf").toString + "/idx"
      Similarity.buildIvfIndex(emb, idxDir, "vec_id", "embedding", dim = 64)
      val approx = Similarity.ivfIndexTopK(s, idxDir, q,
        "vec_id", "embedding", kNeighbors = 5, nProbe = 6)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      Similarity.recallOk(approx, exact, threshold = 0.7)
    },

    // ---- sharded HNSW ANN (pure-JVM Malkov-Yashunin graph per
    // corpus shard, queries fan out, shard top-k merge globally — the
    // graph-ANN recall/latency class the reference reaches via faiss).
    // Fully deterministic (id-hashed levels, id-sorted insertion), so
    // recall@5 vs brute force is oracle-checkable like s02/s03.
    QDef(
      "s05_knn_hnsw",
      """SELECT DISTINCT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      val approx = Similarity.hnswTopK(emb, q, "vec_id", "embedding",
        kNeighbors = 5, shards = 4, m = 8, efConstruction = 64, efSearch = 48)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      Similarity.recallOk(approx, exact, threshold = 0.8)
    },

    // ---- persisted HNSW index: build the sharded graphs ONCE into a
    // parquet sidecar, then probe with zero build jobs — the amortized
    // graph-ANN path (reference role: paimon-faiss persisted global
    // vector indexes). Probed twice to exercise the reuse; the plan's
    // only scan is the graphs parquet (spec-asserted). Recall-gated
    // like s05 — the persisted graphs are bit-identical to the
    // in-memory ones (deterministic levels + insertion order), so the
    // same threshold holds.
    QDef(
      "s06_knn_hnsw_index",
      """SELECT DISTINCT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-s06-hnsw").toString + "/idx"
      Similarity.buildHnswIndex(emb, idxDir, "vec_id", "embedding",
        shards = 4, m = 8, efConstruction = 64)
      // first probe warms nothing persistent — the second must still
      // run zero build jobs (only the graphs parquet scan)
      Similarity.hnswIndexTopK(s, idxDir, q, "vec_id", "embedding",
        kNeighbors = 5, efSearch = 48).count()
      val approx = Similarity.hnswIndexTopK(s, idxDir, q, "vec_id", "embedding",
        kNeighbors = 5, efSearch = 48)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      Similarity.recallOk(approx, exact, threshold = 0.8)
    },

    // ---- TABLE-ATTACHED vector index (reference: paimon-faiss
    // global vector indexes created by CreateGlobalIndexProcedure):
    // embeddings stored IN a graft table, rebuild_vector_index stamps
    // a sharded-HNSW sidecar with the snapshot id, vectorSearch
    // probes it while fresh and falls back to an in-memory build on
    // any later commit — never a stale result. Recall-gated like
    // s05/s06; the write wave after the first build exercises the
    // staleness fallback inside the gate (new vectors must appear),
    // the second rebuild the refreshed-sidecar path.
    QDef(
      "s07_vector_index_table",
      """SELECT DISTINCT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin) { (s, dir) =>
      import graft.table.GraftTable
      val emb = tbl(s, dir, "embeddings")
      val t = GraftTable.create(s,
        java.nio.file.Files.createTempDirectory("graft-s07-").toString + "/table",
        emb.schema)
      val half = emb.filter(col("vec_id") % 2 === 0)
      t.write(half)
      t.rebuildVectorIndex("vec_id", "embedding")
      t.write(emb.filter(col("vec_id") % 2 === 1)) // stales the sidecar
      val q = emb.filter(col("vec_id") < 5)
      // stale path: must see the odd half via fallback
      val staleApprox = t.vectorSearch("vec_id", "embedding", q, kNeighbors = 5)
      t.rebuildVectorIndex("vec_id", "embedding")
      val freshApprox = t.vectorSearch("vec_id", "embedding", q, kNeighbors = 5)
      val exact = Similarity.bruteForceTopK(t.read, q, "vec_id", "embedding", 5)
      Similarity.recallOk(staleApprox, exact, threshold = 0.8)
        .join(Similarity.recallOk(freshApprox, exact, threshold = 0.8)
          .withColumnRenamed("recall_ok", "fresh_ok"), "query_id")
        .select(col("query_id"), (col("recall_ok") && col("fresh_ok")).as("recall_ok"))
    },

    // ---- incremental HNSW maintenance: the index is built on HALF the
    // corpus, the other half is INSERTED into the persisted shard
    // graphs (no rebuild — HNSW insertion is naturally incremental),
    // and the probe must reach recall over the FULL corpus through the
    // grown graphs. The generation-swap write keeps concurrent probes
    // on a complete file set.
    QDef(
      "s08_knn_hnsw_append",
      """SELECT DISTINCT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-s08-hnsw").toString + "/idx"
      Similarity.buildHnswIndex(emb.filter(col("vec_id") % 2 === 0), idxDir,
        "vec_id", "embedding", shards = 4, m = 8, efConstruction = 64)
      Similarity.appendToHnswIndex(emb.filter(col("vec_id") % 2 === 1), idxDir,
        "vec_id", "embedding", shards = 4, m = 8, efConstruction = 64)
      val approx = Similarity.hnswIndexTopK(s, idxDir, q, "vec_id", "embedding",
        kNeighbors = 5, efSearch = 48)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      Similarity.recallOk(approx, exact, threshold = 0.8)
    },

    // ---- embedding-cosine near-dup, exhaustive-blocked companion.
    // The raw embeddings have no near-dup structure (max pairwise
    // cosine ~0.6), so the query PLANTS deterministic near-duplicates:
    // each vector is paired with a perturbed copy (v + 0.1*reverse(v),
    // cosine ~0.995 to its source, <=~0.6 to everything else). The
    // construction is pure arithmetic, so the oracle rebuilds it
    // bit-identically in SQL and the gate is hash-exact.
    QDef(
      "p10_cosine_pairs_blocked",
      plantedCosineOracle(blocked = true)) { (s, dir) =>
      Dedup.cosinePairsBlocked(plantedEmbeddings(s, dir),
        "vec_id", "label", "v", threshold = 0.9)
    },

    // ---- embedding-cosine near-dup, LSH path (the 100 TB plan: bucket
    // join + candidate-only verification, never all-pairs). With the
    // planted pairs at cosine ~0.995 and 10 tables x 10 planes, the
    // fixed-seed LSH finds every true pair (miss probability ~3e-6 per
    // pair, and deterministic given the seed) — so the gate is held to
    // the SAME exact oracle as p10: a dropped candidate or hash drift
    // fails the compare.
    QDef(
      "p11_embedding_lsh_dedup",
      plantedCosineOracle(blocked = false)) { (s, dir) =>
      Dedup.cosineDedupPairs(plantedEmbeddings(s, dir),
        "vec_id", "v", dim = 64, threshold = 0.9)
    },

    // ---- end-to-end training-data pipeline: exact dedup → quality
    // filter → token stats → append into a graft table → read back.
    // Composes the verified pieces (p01/p02/p03) THROUGH the storage
    // engine in one hash-exact gate — what a data-curation job
    // actually runs.
    QDef(
      "p12_pipeline_e2e",
      """WITH canon AS (
        |  SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
        |    arg_min(lang, doc_id) AS lang, text
        |  FROM documents GROUP BY text),
        |kept AS (SELECT * FROM canon
        |  WHERE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        |    / greatest(length(text), 1) >= 0.5)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT) AS n_tokens
        |FROM kept GROUP BY lang""".stripMargin) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      val canon = docs.groupBy(col("text"))
        .agg(min_by(struct(col("doc_id"), col("lang")), col("doc_id")).as("c"))
        .select(col("c.doc_id").as("doc_id"), col("c.lang").as("lang"), col("text"))
      val kept = canon.filter(TA.alphaRatio(col("text")) >= 0.5)
      val out = kept
        .select(col("lang"), TA.tokenCount(col("text")).as("nt"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      val t = graft.table.GraftTable.create(s,
        java.nio.file.Files.createTempDirectory("graft-p12-").toString + "/t",
        out.schema)
      t.write(out)
      t.read.select(col("lang"), col("n_docs"), col("n_tokens"))
    },

    // ---- distributed connected components + cluster-level dedup:
    // near-dup pair output resolved into "keep one doc per cluster".
    // The edge set here is SQL-expressible by construction (chains of
    // 10 consecutive ids, every third block left edgeless), so the
    // CLUSTER RESOLUTION itself — label propagation with pointer
    // jumping, the at-scale path — is what the oracle checks:
    // canonical = block head absorbing 9 members, singleton blocks
    // survive untouched.
    QDef(
      "p13_components_dedup",
      """SELECT doc_id, CAST(doc_id AS BIGINT) AS component,
        |  CAST(9 AS BIGINT) AS n_dropped
        |FROM documents WHERE (doc_id // 10) % 3 <> 2 AND doc_id % 10 = 0
        |UNION ALL
        |SELECT doc_id, CAST(doc_id AS BIGINT) AS component,
        |  CAST(0 AS BIGINT) AS n_dropped
        |FROM documents WHERE (doc_id // 10) % 3 = 2""".stripMargin) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      val pairs = docs
        .filter(col("doc_id") % 10 < 9 && expr("doc_id DIV 10") % 3 =!= 2)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      graft.operators.Components.dedupByPairs(docs, "doc_id", pairs)
        .select(col("doc_id"), col("component"), col("n_dropped"))
    },

    // ---- BPE-style regex pre-tokenization (letters / digits /
    // punctuation runs), verified cross-engine.
    QDef(
      "p09_regex_tokens",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_pieces,
        |  array_to_string(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')[1:5], ' ') AS first_pieces
        |FROM documents""".stripMargin) { (s, dir) =>
      val pieces = expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          size(pieces).cast("long").as("n_pieces"),
          array_join(slice(pieces, 1, 5), " ").as("first_pieces"))
    },

    // ---- PII detection + redaction: the corpus is deterministically
    // augmented with synthetic identifiers (both engines build the
    // same text), then counted and redacted with RE2-compatible
    // patterns — byte-exact across engines.
    QDef(
      "p14_pii_redaction",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(aug, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IPV4]', 'g'),
        |      '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
        |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g') AS clean
        |FROM (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com from 10.20.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.7 ssn 123-45-6789 tel 555-123-4567' AS aug
        |  FROM documents WHERE doc_id % 7 = 0)""".stripMargin) { (s, dir) =>
      val aug = tbl(s, dir, "documents")
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com from 10.20."),
          (col("doc_id") % 256).cast("string"),
          lit(".7 ssn 123-45-6789 tel 555-123-4567")).as("aug"))
      aug.select(col("doc_id"),
        TA.piiCount(col("aug"), "email").as("n_email"),
        TA.piiCount(col("aug"), "ipv4").as("n_ipv4"),
        TA.redactPii(col("aug")).as("clean"))
    },

    // ---- token-level sequence packing: concatenate documents in
    // doc_id order, slice into 2048-token windows; each doc's
    // (first_pack, last_pack) span is a pure function of the prefix
    // sums — verified cross-engine against a SQL window cum-sum.
    QDef(
      "p15_sequence_packing",
      """SELECT doc_id,
        |  n_tokens,
        |  CAST(cum_before // 2048 AS BIGINT) AS first_pack,
        |  CAST((cum_before + GREATEST(n_tokens, 1) - 1) // 2048 AS BIGINT) AS last_pack
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
        |    COALESCE(SUM(CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT))
        |      OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM documents)""".stripMargin) { (s, dir) =>
      TA.packSequences(tbl(s, dir, "documents"), "doc_id", "text", 2048L)
    },

    // ---- repetition / boilerplate metrics (Gopher-style): duplicate
    // line fraction and duplicate word-3-gram fraction per document.
    QDef(
      "p16_repetition_metrics",
      """SELECT doc_id,
        |  round(CASE WHEN len(lines) <= 0 THEN 0.0
        |    ELSE CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines) END, 6) AS dup_line_ratio,
        |  round(CASE WHEN len(grams) <= 0 THEN 0.0
        |    ELSE CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams) END, 6) AS dup_gram_ratio
        |FROM (
        |  SELECT doc_id,
        |    list_filter(string_split(text, chr(10)), l -> length(trim(l)) > 0) AS lines,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |      ELSE [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
        |    END AS grams
        |  FROM (
        |    SELECT doc_id, text,
        |      regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |    FROM documents))""".stripMargin) { (s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          round(TA.dupLineRatio(col("text")), 6).as("dup_line_ratio"),
          round(TA.dupNgramRatio(col("text"), 3), 6).as("dup_gram_ratio"))
    },

    // ---- benchmark contamination: corpus docs sharing a word-8-gram
    // with the "benchmark" subset (doc_id % 97 = 0) are flagged with
    // their distinct-hit count — the standard pre-training
    // decontamination pass, verified cross-engine.
    QDef(
      "p17_contamination",
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)]
        |    END)) AS g
        |  FROM toks),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_grams,
        |  MIN(g.g) AS example_gram
        |FROM grams g JOIN bench USING (g)
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      graft.operators.Contamination.flag(
        docs, docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", w = 8)
    },

    // ---- deterministic data mixing: per-source quotas selected by a
    // reproducible double-Lehmer key (((id*48271)%M)*48271)%M — re-
    // running the pipeline (any partitioning, any engine) picks the
    // same rows.
    QDef(
      "p18_data_mixing",
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY ((doc_id * 48271) % 2147483647 * 48271) % 2147483647,
        |        doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 10""".stripMargin) { (s, dir) =>
      graft.operators.Sampling.mixSources(
        tbl(s, dir, "documents"), "source", "doc_id", quota = 10L)
        .select(col("doc_id"), col("source"))
    },

    // ---- the full pretraining curation chain, end to end and
    // oracle-exact: benchmark decontamination (word-8-gram overlap) →
    // quality filter (alpha ratio + min tokens) → per-source quota
    // mixing (deterministic Lehmer keys) → token-level sequence
    // packing. Every stage is the scale path: broadcast contamination
    // join, codegen'd quality exprs, one source shuffle, two-phase
    // prefix sum.
    QDef(
      "p19_curation_full",
      """WITH toks AS (
        |  SELECT doc_id, source, text,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)]
        |    END)) AS g
        |  FROM toks),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
        |contaminated AS (
        |  SELECT DISTINCT doc_id FROM grams JOIN bench USING (g)
        |  WHERE doc_id % 97 <> 0),
        |quality AS (
        |  SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tokens
        |  FROM toks
        |  WHERE doc_id % 97 <> 0
        |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        |    AND CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1) >= 0.6
        |    AND len(t) >= 20),
        |mixed AS (
        |  SELECT doc_id, source, n_tokens FROM (
        |    SELECT doc_id, source, n_tokens,
        |      ROW_NUMBER() OVER (PARTITION BY source
        |        ORDER BY ((doc_id * 48271) % 2147483647 * 48271) % 2147483647,
        |          doc_id) AS rk
        |    FROM quality)
        |  WHERE rk <= 15)
        |SELECT doc_id, source, n_tokens,
        |  CAST(cum_before // 1024 AS BIGINT) AS first_pack,
        |  CAST((cum_before + GREATEST(n_tokens, 1) - 1) // 1024 AS BIGINT) AS last_pack
        |FROM (
        |  SELECT doc_id, source, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM mixed)""".stripMargin) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      val flagged = graft.operators.Contamination
        .flag(corpus, bench, "doc_id", "text", w = 8).select("doc_id")
      val quality = corpus.join(flagged, Seq("doc_id"), "left_anti")
        .filter(TA.alphaRatio(col("text")) >= 0.6 &&
          TA.tokenCount(col("text")) >= 20L)
        .select(col("doc_id"), col("source"), col("text"))
      // pinned: packSequences and the source join both consume `mixed`,
      // and without the cache each would re-run the contamination join
      // + quality filter + mixing shuffle from scratch
      val mixed = graft.operators.Sampling
        .mixSources(quality, "source", "doc_id", quota = 15L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      TA.packSequences(mixed, "doc_id", "text", 1024L)
        .join(mixed.select("doc_id", "source"), "doc_id")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("first_pack"), col("last_pack"))
    },

    // ---- incremental corpus dedup: the corpus half is banded ONCE
    // into a persisted (band,bh)->ids index table; the increment is
    // deduped by probing only its own bands against that index —
    // O(increment) work per batch, the only shape that survives a
    // growing 100 TB corpus. Planted dups of corpus docs arrive in the
    // increment and must be found via the INDEX (their sources are not
    // in the increment).
    QDef(
      "p20_incremental_dedup",
      """SELECT CAST(doc_id AS BIGINT) AS src_id, TRUE AS dup_found
        |FROM documents WHERE doc_id % 10 = 0 AND doc_id % 2 = 0""".stripMargin) { (s, dir) =>
      import graft.operators.Dedup
      val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val planted = corpus.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val increment = docs.filter(col("doc_id") % 2 === 1).unionAll(planted)

      // k=16/bands=4 keeps the gate cheap; planted EXACT dups share
      // every band, so recall is unaffected by the band count
      val idx = Dedup.createBandIndex(s,
        java.nio.file.Files.createTempDirectory("graft-p20-")
          .toString + "/bandidx")
      Dedup.appendToBandIndex(idx, corpus, "doc_id", "text", k = 16, bands = 4)
      val pairs = Dedup.dedupIncrementPairs(
        idx, corpusTexts = corpus, increment = increment,
        idCol = "doc_id", textCol = "text", threshold = 0.7, k = 16, bands = 4)
      // every planted doc must match its corpus source THROUGH the index
      val found = pairs.filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a").as("src_id"))
      corpus.filter(col("doc_id") % 10 === 0).select(col("doc_id").as("src_id"))
        .join(found, Seq("src_id"), "left_semi")
        .select(col("src_id"), lit(true).as("dup_found"))
    },

    // ---- SemDeDup semantic dedup (Abbas et al., arXiv:2303.09540):
    // cluster embeddings, greedily drop within-cluster near-dups. The
    // planted corpus doubles every vector under id+100000 — identical
    // vectors always co-cluster (same argmax), so every duplicate must
    // drop and every base id must survive (base pairwise cosine maxes
    // ~0.6, far under the 0.9 threshold). The oracle is exactly the
    // base id set: a duplicate surviving (wrong greedy), a base id
    // lost (over-aggressive drop), or nondeterministic clustering all
    // fail the hash.
    QDef(
      "p21_semantic_dedup",
      """SELECT CAST(vec_id AS BIGINT) AS vec_id FROM embeddings""") { (s, dir) =>
      import graft.operators.Dedup
      val base = tbl(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val dup = base.select((col("vec_id") + 100000L).as("vec_id"), col("v"))
      Dedup.semanticDedup(base.unionAll(dup), "vec_id", "v",
        nClusters = 16, threshold = 0.9)
        .select(col("vec_id").cast("long").as("vec_id"))
    },

    // ---- bigram-LM perplexity scoring (CCNet/Gopher-style quality
    // filtering): the LM trains on the corpus itself, every document
    // scores its mean bigram negative log-likelihood, and the oracle
    // recomputes the identical add-one-smoothed model in SQL — a
    // wrong count, a smoothing slip, or a lost bigram shifts the
    // 6-decimal-rounded score.
    QDef(
      "p22_bigram_nll",
      """WITH toks AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') t FROM documents),
        |big AS (SELECT doc_id, t[i] AS prev, t[i+1] AS cur
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i)),
        |cnt AS (SELECT prev, cur, count(*) AS c FROM big GROUP BY 1, 2),
        |ptot AS (SELECT prev, count(*) AS cp FROM big GROUP BY 1),
        |v AS (SELECT count(DISTINCT x) AS v
        |  FROM (SELECT unnest(t) AS x FROM toks)),
        |sc AS (SELECT b.doc_id, ln((c + 1.0)/(cp + v.v)) AS lp
        |  FROM big b JOIN cnt USING (prev, cur) JOIN ptot USING (prev)
        |  CROSS JOIN v)
        |SELECT doc_id, CAST(ROUND(-avg(lp), 6) AS DOUBLE) AS nll
        |FROM sc GROUP BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.TextAnalysis
      val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      TextAnalysis.bigramNll(docs, "doc_id", "text", docs, "text")
        .select(col("doc_id"), asDouble(col("nll"), 6).as("nll"))
    },

    // ---- exact substring dedup (Lee et al., arXiv:2107.06499):
    // maximal duplicated k-token spans via distributed k-gram
    // islands. The oracle recomputes the identical pipeline — same
    // tokenization, duplicated-gram set, gaps-and-islands merge — on
    // the gram STRINGS (the Spark side groups 64-bit gram hashes; a
    // disagreement would surface a collision or a tokenization
    // drift). The corpus's planted near-dups give real spans.
    QDef(
      "p23_substring_dedup",
      """WITH toks AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') t FROM documents),
        |grams AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') g
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i)),
        |dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
        |duppos AS (SELECT doc_id, i FROM grams JOIN dupg USING (g)),
        |isl AS (SELECT doc_id, i,
        |  i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        |  FROM duppos)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(min(i) AS BIGINT) AS span_start,
        |  CAST(max(i) + 7 AS BIGINT) AS span_end
        |FROM isl GROUP BY doc_id, grp""".stripMargin) { (s, dir) =>
      import graft.operators.Dedup
      Dedup.duplicatedSpans(
        tbl(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 8)
    },

    // ---- substring-dedup STRIP: cut every duplicated span except its
    // globally-first occurrence and rebuild the texts. The oracle
    // mirrors the ownership rank (row_number over gram occurrences
    // ordered by doc, position), the token cut, and the reassembly —
    // a wrong keeper, an off-by-one span edge, or a lost document all
    // break the hash.
    QDef(
      "p24_substring_strip",
      """WITH toks AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') t FROM documents),
        |grams AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') g
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i)),
        |ranked AS (SELECT doc_id, i,
        |    row_number() OVER (PARTITION BY g ORDER BY doc_id, i) rn,
        |    count(*) OVER (PARTITION BY g) n FROM grams),
        |removed AS (SELECT doc_id, i FROM ranked WHERE n > 1 AND rn > 1),
        |removed_toks AS (SELECT DISTINCT doc_id, ti FROM removed,
        |  LATERAL (SELECT unnest(generate_series(i, i+7)) AS ti)),
        |all_toks AS (SELECT doc_id, i AS ti, t[i] AS tok
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)),
        |kept AS (SELECT a.doc_id, a.ti, a.tok FROM all_toks a
        |  LEFT JOIN removed_toks r USING (doc_id, ti) WHERE r.ti IS NULL),
        |rebuilt AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        |  coalesce(r.text, '') AS text
        |FROM documents d LEFT JOIN rebuilt r USING (doc_id)""".stripMargin) { (s, dir) =>
      import graft.operators.Dedup
      Dedup.stripDuplicateSpans(
        tbl(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 8)
    },

    // ---- fastText-style quality-classifier inference (the scoring
    // half of CCNet/GPT-3-style quality filters): md5-based hashed
    // bag-of-words (engine-portable feature buckets), deterministic
    // rational weights, mean pooling, sigmoid. The oracle recomputes
    // features, weights and pooling independently; a hash-bucket
    // drift, a pooling slip, or a missing-token default breaks the
    // 6-dp hash.
    QDef(
      "p25_quality_classifier",
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |feat AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(tok), 25, 8)) AS BIGINT) % 4096 AS bucket
        |  FROM toks),
        |w AS (SELECT b AS bucket, ((b*37+11) % 201 - 100)/100.0 AS weight
        |  FROM (SELECT unnest(generate_series(0, 4095)) AS b)),
        |z AS (SELECT doc_id,
        |    -0.1 + sum(coalesce(weight, 0))/count(*) AS z
        |  FROM feat LEFT JOIN w USING (bucket) GROUP BY doc_id)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(ROUND(1.0/(1.0 + exp(-z)), 6) AS DOUBLE) AS score
        |FROM z""".stripMargin) { (s, dir) =>
      import graft.operators.TextAnalysis
      val dims = 4096
      val weights = s.range(0, dims).select(col("id").as("bucket"),
        (((col("id") * 37 + 11) % 201 - 100).cast("double") / 100.0).as("weight"))
      TextAnalysis.linearClassifierScore(
        tbl(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", weights, dims, bias = -0.1)
        .select(col("doc_id"), asDouble(col("score"), 6).as("score"))
    },

    // ---- deterministic train/val/test split assignment: membership
    // is a pure function of the id (double-Lehmer key vs cumulative
    // weight boundaries), so re-runs and corpus growth never migrate
    // a document between splits. The oracle recomputes the identical
    // integer arithmetic; FLOOR matches Scala's toLong truncation at
    // the boundaries.
    QDef(
      "p26_split_assign",
      """WITH s AS (SELECT doc_id,
        |    ((doc_id * 48271) % 2147483647 * 48271) % 2147483647 AS key
        |  FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CASE WHEN key < CAST(FLOOR(0.8 * 2147483647) AS BIGINT) THEN 'train'
        |       WHEN key < CAST(FLOOR(0.9 * 2147483647) AS BIGINT) THEN 'val'
        |       ELSE 'test' END AS split
        |FROM s""".stripMargin) { (s, dir) =>
      import graft.operators.Sampling
      Sampling.splitAssign(
        tbl(s, dir, "documents").select(col("doc_id")),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
    },

    // ---- URL curation: messy URLs (mixed case, default ports, utm
    // params, fragments) built deterministically per doc, normalized,
    // grouped by registered domain (eTLD+1 with the co/com/... 2-part
    // suffixes) and capped per domain by the deterministic sample-key
    // rank. The oracle mirrors every normalization regex (RE2-safe, no
    // lookahead), the domain CASE and the ranked cap — a wrong regex,
    // suffix rule or rank order is a row diff.
    QDef(
      "p27_url_curation",
      """WITH raw AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.' || source ||
        |      CASE WHEN doc_id % 7 = 0 THEN '.CO.UK:443' ELSE '.COM:443' END ||
        |      '/Docs/' || CAST(doc_id AS VARCHAR) ||
        |      CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&id=' || CAST(doc_id AS VARCHAR)
        |           WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id AS VARCHAR)
        |           ELSE '' END ||
        |      CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS u
        |  FROM documents),
        |n0 AS (SELECT doc_id, u,
        |    regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0) AS pfx
        |  FROM raw),
        |n1 AS (SELECT doc_id, lower(pfx) || substr(u, length(pfx) + 1) AS u FROM n0),
        |n2 AS (SELECT doc_id, regexp_replace(regexp_replace(u,
        |    '^(https://[^/:?#]+):443([/?#]|$)', '\1\2'),
        |    '^(http://[^/:?#]+):80([/?#]|$)', '\1\2') AS u FROM n1),
        |n3 AS (SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM n2),
        |n4 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(u,
        |    '&utm_[^&]*', '', 'g'), '\?utm_[^&]*&', '?'), '\?utm_[^&]*$', '') AS u
        |  FROM n3),
        |norm AS (SELECT doc_id, regexp_replace(regexp_replace(u,
        |    '[?&]$', ''), '([^/])/$', '\1') AS url FROM n4),
        |hosts AS (SELECT doc_id, url,
        |    string_split(lower(regexp_extract(url,
        |      '^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)), '.') AS p
        |  FROM norm),
        |doms AS (SELECT doc_id, url,
        |    CASE WHEN len(p) >= 3 AND p[-2] IN ('co','com','org','net','ac','gov','edu')
        |              AND length(p[-1]) = 2
        |         THEN array_to_string(p[-3:], '.')
        |         ELSE array_to_string(p[-2:], '.') END AS domain
        |  FROM hosts),
        |ranked AS (SELECT doc_id, url, domain,
        |    row_number() OVER (PARTITION BY domain ORDER BY
        |      ((doc_id * 48271) % 2147483647 * 48271) % 2147483647, doc_id) AS rn
        |  FROM doms)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, url, domain
        |FROM ranked WHERE rn <= 10""".stripMargin) { (s, dir) =>
      import graft.operators.UrlCuration
      val id = col("doc_id").cast("string")
      val raw = tbl(s, dir, "documents").select(col("doc_id"), concat(
        lit("HTTPS://WWW."), col("source"),
        when(col("doc_id") % 7 === 0, lit(".CO.UK:443"))
          .otherwise(lit(".COM:443")),
        lit("/Docs/"), id,
        when(col("doc_id") % 3 === 0, concat(lit("?utm_source=x&id="), id))
          .when(col("doc_id") % 3 === 1, concat(lit("?id="), id))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
        .as("u"))
      UrlCuration.capPerDomain(raw, "u", "doc_id", cap = 10L)
        .select(col("doc_id"),
          UrlCuration.normalizeUrl(col("u")).as("url"), col("domain"))
    },

    // ---- cross-document boilerplate removal (CCNet / RefinedWeb
    // line-level dedup): synthetic 4-line docs where one line is
    // universal (cookie banner), one is per-source (footer, df=docs/
    // source), one is the head slice and one unique; lines in more
    // than 10 docs drop, docs reassemble in original line order. The
    // oracle recomputes the split/count/anti-join/ordered-reassembly
    // relationally — a wrong doc-frequency, a lost line, or
    // arrival-order reassembly is a row diff.
    QDef(
      "p28_line_dedup",
      """WITH docs AS (SELECT doc_id,
        |    'HEAD ' || substr(coalesce(text, ''), 1, 40) || chr(10) ||
        |    'COOKIE BANNER ACCEPT ALL' || chr(10) ||
        |    'FOOTER ' || coalesce(source, '') || chr(10) ||
        |    'ID LINE ' || CAST(doc_id AS VARCHAR) AS t
        |  FROM documents),
        |split AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM docs),
        |lines AS (SELECT doc_id, ls[i] AS line, i AS pos
        |  FROM (SELECT doc_id, ls,
        |          unnest(generate_series(1, len(ls))) AS i FROM split)),
        |freq AS (SELECT line FROM lines
        |  GROUP BY line HAVING COUNT(DISTINCT doc_id) > 10)
        |SELECT CAST(k.doc_id AS BIGINT) AS doc_id,
        |  string_agg(k.line, chr(10) ORDER BY k.pos) AS text
        |FROM (SELECT l.* FROM lines l ANTI JOIN freq f USING (line)) k
        |GROUP BY k.doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.{TextAnalysis => TAo}
      val docs = tbl(s, dir, "documents").select(col("doc_id"),
        // coalesce mirrors the oracle exactly: concat_ws SKIPS a NULL
        // piece (3-line doc) while the oracle's '||' would NULL the
        // whole doc — null text/source must build the same 4 lines
        concat_ws("\n",
          concat(lit("HEAD "), substring(coalesce(col("text"), lit("")), 1, 40)),
          lit("COOKIE BANNER ACCEPT ALL"),
          concat(lit("FOOTER "), coalesce(col("source"), lit(""))),
          concat(lit("ID LINE "), col("doc_id").cast("string"))).as("text"))
      TAo.removeFrequentLines(docs, "doc_id", "text", maxDocFreq = 10L)
        .select(col("doc_id"), col("text"))
    },

    // ---- BPE-style pre-tokenizer counts (corpus token budgeting):
    // the GPT-2 pre-tokenizer pattern in RE2-safe form, counted per
    // document over a text enriched with digits/punct/contractions so
    // every alternation branch fires. The oracle runs the IDENTICAL
    // pattern in DuckDB's RE2 — any Java-vs-RE2 semantic drift or a
    // wrong branch order shows as a count diff.
    QDef(
      "p29_bpe_token_count",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(
        |    text || ' it''s v2.0, #' || CAST(doc_id AS VARCHAR) || '!',
        |    '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\t\n\f\r \p{L}\p{N}]+|[\t\n\f\r ]+'))
        |    AS BIGINT) AS n_bpe,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)
        |    AS n_ws
        |FROM documents""".stripMargin) { (s, dir) =>
      import graft.operators.{TextAnalysis => TAo}
      val enriched = concat(col("text"), lit(" it's v2.0, #"),
        col("doc_id").cast("string"), lit("!"))
      tbl(s, dir, "documents").select(col("doc_id"),
        TAo.bpeTokenCount(enriched).as("n_bpe"),
        TAo.tokenCount(col("text")).as("n_ws"))
    },

    // ---- DSIR-style importance weighting (Xie et al. 2023): score
    // every raw document by target-likeness (target = the English
    // slice), integer micro-unit weights so scores are EXACT 64-bit
    // sums, top-50 by (score, doc_id). The oracle recomputes document
    // frequencies, the quantized ratio and the per-doc sum relationally
    // — a drifted count, a float-order difference or a wrong smoothing
    // constant is a row diff. (The hashed-feature scale path is
    // spec-gated against this exact form.)
    QDef(
      "p30_dsir_weights",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t <> ''))) AS tok
        |  FROM documents),
        |raw AS (SELECT tok, count(*) AS cr FROM toks GROUP BY tok),
        |tgt AS (SELECT tok, count(*) AS ct FROM toks WHERE lang = 'en' GROUP BY tok),
        |w AS (SELECT raw.tok,
        |    CAST(floor(1000000.0 * (COALESCE(tgt.ct, 0) + 1.0) / (raw.cr + 1.0)) AS BIGINT) AS w
        |  FROM raw LEFT JOIN tgt ON raw.tok = tgt.tok),
        |s AS (SELECT t.doc_id, sum(w.w) AS iw_score
        |  FROM toks t JOIN w ON t.tok = w.tok GROUP BY t.doc_id),
        |sc AS (SELECT d.doc_id, coalesce(s.iw_score, 0) AS iw_score
        |  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN s USING (doc_id))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(iw_score AS BIGINT) AS iw_score
        |FROM sc ORDER BY iw_score DESC, doc_id LIMIT 50""".stripMargin) { (s, dir) =>
      import graft.operators.Sampling
      val docs = tbl(s, dir, "documents")
      val weights = Sampling.importanceWeights(
        docs, docs.filter(col("lang") === "en"), "text")
      Sampling.importanceScores(docs, "doc_id", "text", weights)
        .orderBy(desc("iw_score"), col("doc_id")).limit(50)
    },

    // ---- distributed BPE vocabulary learning: 3 merge rounds over the
    // corpus word-frequency table. The oracle unrolls the SAME rounds
    // relationally (pair counts from the symbol sequences, argmax with
    // the (count, left, right) tie-break, greedy left-to-right merge
    // application via delimiter-exact string replace) — a wrong count,
    // tie-break or a non-greedy application shows as a row diff.
    QDef(
      "p31_bpe_learn",
      """WITH wf AS (
        |  SELECT w AS word, count(*) AS freq FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t <> '')) AS w
        |    FROM documents) GROUP BY w),
        |s0 AS (SELECT '  ' || array_to_string(
        |    list_transform(generate_series(1, length(word)), i -> substr(word, i, 1)), '  ')
        |    || '  ' AS seq, freq FROM wf),
        |c1 AS (SELECT syms[i] AS l, syms[i+1] AS r, sum(freq) AS cnt FROM (
        |    SELECT string_split(trim(seq), '  ') AS syms, freq,
        |      unnest(generate_series(1, len(string_split(trim(seq), '  ')) - 1)) AS i
        |    FROM s0 WHERE len(string_split(trim(seq), '  ')) > 1)
        |  GROUP BY 1, 2),
        |b1 AS (SELECT l, r, cnt FROM c1 ORDER BY cnt DESC, l, r LIMIT 1),
        |s1 AS (SELECT replace(seq, ' ' || b1.l || '  ' || b1.r || ' ',
        |    ' ' || b1.l || b1.r || ' ') AS seq, freq FROM s0, b1),
        |c2 AS (SELECT syms[i] AS l, syms[i+1] AS r, sum(freq) AS cnt FROM (
        |    SELECT string_split(trim(seq), '  ') AS syms, freq,
        |      unnest(generate_series(1, len(string_split(trim(seq), '  ')) - 1)) AS i
        |    FROM s1 WHERE len(string_split(trim(seq), '  ')) > 1)
        |  GROUP BY 1, 2),
        |b2 AS (SELECT l, r, cnt FROM c2 ORDER BY cnt DESC, l, r LIMIT 1),
        |s2 AS (SELECT replace(seq, ' ' || b2.l || '  ' || b2.r || ' ',
        |    ' ' || b2.l || b2.r || ' ') AS seq, freq FROM s1, b2),
        |c3 AS (SELECT syms[i] AS l, syms[i+1] AS r, sum(freq) AS cnt FROM (
        |    SELECT string_split(trim(seq), '  ') AS syms, freq,
        |      unnest(generate_series(1, len(string_split(trim(seq), '  ')) - 1)) AS i
        |    FROM s2 WHERE len(string_split(trim(seq), '  ')) > 1)
        |  GROUP BY 1, 2),
        |b3 AS (SELECT l, r, cnt FROM c3 ORDER BY cnt DESC, l, r LIMIT 1)
        |SELECT CAST(1 AS INTEGER) AS rank, l AS left, r AS right, CAST(cnt AS BIGINT) AS pair_count FROM b1
        |UNION ALL SELECT CAST(2 AS INTEGER), l, r, CAST(cnt AS BIGINT) FROM b2
        |UNION ALL SELECT CAST(3 AS INTEGER), l, r, CAST(cnt AS BIGINT) FROM b3""".stripMargin) { (s, dir) =>
      graft.operators.Bpe.learnMerges(tbl(s, dir, "documents"), "text", numMerges = 3)
    },

    // ---- Gopher quality rules (Rae et al. 2021 A1.1) as per-rule
    // flags: the text is deterministically enriched so every rule
    // fires both ways across the corpus (stop-word padding, a glued
    // symbol run, numeric words, 19 bullet lines, ellipsis-terminated
    // lines). The oracle recomputes every count, fraction and
    // threshold relationally — a drifted denominator, tokenizer or
    // boundary comparison flips a boolean.
    QDef(
      "p32_gopher_rules",
      """WITH e AS (SELECT doc_id, coalesce(text, '')
        |    || CASE WHEN doc_id % 2 = 0 THEN ' the of and' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' ############' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' 11 22 33 44 55 66 77 88 99 00' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 0 THEN repeat(chr(10) || '- b', 19) ELSE '' END
        |    || CASE WHEN doc_id % 3 = 0 THEN repeat(chr(10) || 'end...', 2) ELSE '' END AS t
        |  FROM documents),
        |m AS (SELECT doc_id, t,
        |    list_filter(regexp_split_to_array(trim(lower(t)), '\s+'), w -> w <> '') AS ws,
        |    string_split(t, chr(10)) AS ls
        |  FROM e),
        |f AS (SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS nw,
        |    CAST(greatest(len(ws), 1) AS DOUBLE) AS dw,
        |    CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS DOUBLE)
        |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS meanlen,
        |    ((length(t) - length(replace(t, '#', '')))
        |      + (length(t) - length(replace(t, '...', ''))) / 3)
        |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS symr,
        |    len(list_filter(ls, l -> starts_with(l, '- ') OR starts_with(l, '* ')
        |        OR starts_with(l, '• ')))
        |      / CAST(greatest(len(ls), 1) AS DOUBLE) AS bulletf,
        |    len(list_filter(ls, l -> ends_with(l, '...')))
        |      / CAST(greatest(len(ls), 1) AS DOUBLE) AS ellipf,
        |    len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
        |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS alphaf,
        |    len(list_intersect(list_distinct(ws),
        |      ['the','be','to','of','and','that','have','with'])) AS stops
        |  FROM m)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  nw >= 50 AND nw <= 100000 AS ok_words,
        |  meanlen >= 3.0 AND meanlen <= 10.0 AS ok_mean_len,
        |  symr < 0.1 AS ok_symbol,
        |  bulletf < 0.9 AS ok_bullets,
        |  ellipf < 0.3 AS ok_ellipsis,
        |  alphaf >= 0.8 AS ok_alpha,
        |  stops >= 2 AS ok_stops,
        |  (nw >= 50 AND nw <= 100000) AND (meanlen >= 3.0 AND meanlen <= 10.0)
        |    AND symr < 0.1 AND bulletf < 0.9 AND ellipf < 0.3
        |    AND alphaf >= 0.8 AND stops >= 2 AS keep
        |FROM f""".stripMargin) { (s, dir) =>
      import graft.operators.{TextAnalysis => TAo}
      // NULL text coalesces to '' BEFORE enrichment on BOTH sides, so
      // a NULL-text corpus builds the same enriched string in each
      // engine (the p28 NULL-propagation class — '||' would NULL the
      // whole doc while Spark-side concat-then-flags would not)
      val enriched = concat(coalesce(col("text"), lit("")),
        when(col("doc_id") % 2 === 0, lit(" the of and")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" ############")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" 11 22 33 44 55 66 77 88 99 00"))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit("\n- b" * 19)).otherwise(lit("")),
        when(col("doc_id") % 3 === 0, lit("\nend..." * 2)).otherwise(lit("")))
      tbl(s, dir, "documents")
        .select(col("doc_id"), TAo.gopherQualityFlags(enriched).as("g"))
        .select(col("doc_id"), col("g.ok_words"), col("g.ok_mean_len"),
          col("g.ok_symbol"), col("g.ok_bullets"), col("g.ok_ellipsis"),
          col("g.ok_alpha"), col("g.ok_stops"), col("g.keep"))
    })

  /** embeddings ∪ deterministic perturbed copies (id + 100000, same
    * label): the planted near-dup corpus shared by p10/p11. */
  private def plantedEmbeddings(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val base = tbl(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val pert = base.select((col("vec_id") + 100000).as("vec_id"), col("label"),
      zip_with(col("v"), reverse(col("v")), (a, b) => a + lit(0.1) * b).as("v"))
    base.union(pert)
  }

  /** DuckDB oracle for the planted-cosine gates: identical perturbation
    * arithmetic + identical dot/norm formulation (same left-to-right
    * summation as Spark's `aggregate` fold), thresholded on the
    * ROUNDED cosine in both engines so the boundary decision agrees. */
  private def plantedCosineOracle(blocked: Boolean): String = {
    val joinCond =
      if (blocked) "a.label = b.label AND a.vec_id < b.vec_id"
      else "a.vec_id < b.vec_id"
    s"""WITH base AS (SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |corpus AS (
       |  SELECT vec_id, label, v FROM base
       |  UNION ALL
       |  SELECT vec_id + 100000, label,
       |    list_transform(generate_series(1, 64), i -> v[i] + 0.1 * v[65 - i])
       |  FROM base),
       |n AS (SELECT vec_id, label, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM corpus)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(list_sum(list_transform(generate_series(1, 64),
       |      i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS cosine
       |FROM n a JOIN n b ON $joinCond
       |WHERE round(list_sum(list_transform(generate_series(1, 64),
       |      i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) >= 0.9""".stripMargin
  }
}
