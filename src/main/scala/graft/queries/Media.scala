package graft.queries

import graft.operators.Multimodal
import graft.table.GraftTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Multimodal-column queries: binary payload plumbing, frame sampling,
  * stubbed decode/featurize, and ANALYZE statistics — verified where
  * the math is SQL-expressible, rows-only where hash-derived.
  */
object Media {

  val defs: Vector[QDef] = Vector(
    // ---- media ingestion plumbing: binary payloads + typed metadata.
    QDef(
      "x01_media_ingest",
      """SELECT doc_id AS asset_id,
        |  ['png', 'jpeg', 'webp'][CAST(doc_id % 3 + 1 AS INT)] AS format,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin) { (s, dir) =>
      Multimodal.syntheticAssets(tbl(s, dir, "documents"), "doc_id", "text")
        .select(col("asset_id"), col("format"),
          length(col("payload")).cast("long").as("n_bytes"))
    },

    // ---- frame sampling over binary payloads (pure binary slicing).
    QDef(
      "x02_frame_sample",
      """SELECT doc_id AS asset_id, fn AS frame_no,
        |  CAST(least(16, octet_length(encode(text)) - fn * 16) AS BIGINT) AS frame_len
        |FROM documents,
        |  LATERAL unnest(generate_series(0,
        |    CAST((octet_length(encode(text)) - 1) // 16 AS BIGINT))) AS t(fn)
        |WHERE fn % 4 = 0""".stripMargin) { (s, dir) =>
      val assets = Multimodal.syntheticAssets(tbl(s, dir, "documents"), "doc_id", "text")
      Multimodal.sampleFrames(assets, frameBytes = 16, everyN = 4)
        .select(col("asset_id"), col("frame_no"), col("frame_len"))
    },

    // ---- stubbed decode + feature extraction via mapPartitions.
    // The codec itself is env-stubbed, but the fake's "pixel
    // statistics" are engine-portable modular arithmetic over
    // (asset_id, payload byte length) — every output is k/4096,
    // exactly representable in float and double — so the gate carries
    // a FULL value oracle: the mapPartitions plumbing (per-partition
    // init, typed Dataset batching, failure channel `ok`) is what's
    // actually under test, and a dropped/duplicated row or a wrong
    // byte count fails the hash compare.
    QDef(
      "x03_media_decode_features",
      """SELECT doc_id AS asset_id, nb > 0 AS ok,
        |  CAST(CASE WHEN nb > 0 THEN nb ELSE 0 END AS BIGINT) AS n_bytes,
        |  CASE WHEN nb > 0 THEN
        |    CAST(((doc_id % 131071) * 48271 + nb % 131071) % 4096 AS DOUBLE) / 4096.0
        |  ELSE 0.0 END AS mean_intensity,
        |  CASE WHEN nb > 0 THEN
        |    CAST(((doc_id % 131071) * 40503 + nb % 131071) % 4096 AS DOUBLE) / 4096.0
        |  ELSE 0.0 END AS f0
        |FROM (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents)""".stripMargin) { (s, dir) =>
      import s.implicits._
      val assets = Multimodal.syntheticAssets(tbl(s, dir, "documents"), "doc_id", "text")
        .as[Multimodal.MediaAsset]
      Multimodal.decodeAndFeaturize(assets, dim = 8)
        .toDF()
        .select(col("asset_id"), col("ok"), col("n_bytes"),
          col("mean_intensity"),
          element_at(col("features"), 1).cast("double").as("f0"))
    },

    // ---- stubbed resize: the pixel kernel is env-stubbed, but the
    // fake's size accounting is pure arithmetic (payload truncated by
    // the pixel-scale factor over the portable synthetic dimensions),
    // so the gate carries a FULL value oracle. The oracle measures the
    // UTF-8 BYTE length (octet_length over the encoded text), matching
    // the implementation's binary payload — correct even if the
    // corpus regenerates with multibyte text.
    QDef(
      "x04_media_resize",
      """SELECT doc_id AS asset_id,
        |  CAST(64 AS BIGINT) AS width, CAST(64 AS BIGINT) AS height,
        |  CAST(greatest(ceil(octet_length(encode(text)) *
        |    least(4096.0 / (w * h), 1.0)), 1) AS BIGINT) AS n_bytes
        |FROM (SELECT doc_id, text,
        |        ((doc_id % 131071) * 40503) % 512 + 32 AS w,
        |        ((doc_id % 131071) * 48271) % 512 + 32 AS h
        |      FROM documents)""".stripMargin) { (s, dir) =>
      val assets = Multimodal.syntheticAssets(tbl(s, dir, "documents"), "doc_id", "text")
      Multimodal.resize(assets, 64, 64)
        .select(col("asset_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          length(col("payload")).cast("long").as("n_bytes"))
    },

    // ---- ANALYZE TABLE: column statistics persisted by the storage
    // layer; count/null/min/max verified against the oracle.
    QDef(
      "x05_analyze_stats",
      """SELECT 'l_quantity' AS column, CAST(COUNT(l_quantity) AS BIGINT) AS cnt,
        |  CAST(0 AS BIGINT) AS nulls,
        |  CAST(MIN(l_quantity) AS VARCHAR) AS min_v,
        |  CAST(MAX(l_quantity) AS VARCHAR) AS max_v
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_orderkey' AS column, CAST(COUNT(l_orderkey) AS BIGINT) AS cnt,
        |  CAST(0 AS BIGINT) AS nulls,
        |  CAST(MIN(l_orderkey) AS VARCHAR) AS min_v,
        |  CAST(MAX(l_orderkey) AS VARCHAR) AS max_v
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val src = tbl(s, dir, "lineitem")
      val t = GraftTable.create(s,
        Files.createTempDirectory("graft-x05-").toString + "/table", src.schema)
      t.write(src)
      t.analyze()
      t.systemStatistics
        .filter(col("column").isin("l_quantity", "l_orderkey"))
        .select(col("column"), col("count").as("cnt"),
          col("null_count").as("nulls"),
          col("min").as("min_v"), col("max").as("max_v"))
    },

    // ---- HLL sketch merge engine. The estimate itself is
    // engine-specific, but its ERROR BOUND is not: lgK=12 gives ~0.8%
    // relative standard error, so a 5% gate is ~6 sigma — it passes
    // iff the merge engine actually combined the per-epoch sketches
    // (a dropped or double-merged epoch shifts the estimate far past
    // it). Same falsifiable construction as the ANN recall@k gates.
    QDef(
      "x06_hll_merge_engine",
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS within_bound
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types._
      val t = GraftTable.create(s,
        java.nio.file.Files.createTempDirectory("graft-x06-").toString + "/table",
        StructType(Seq(
          StructField("event_type", StringType, nullable = false),
          StructField("users", BinaryType, nullable = true))),
        primaryKeys = Seq("event_type"),
        options = Map(
          "merge-engine" -> "aggregation",
          "fields.users.aggregate-function" -> "hll_sketch"))
      val sink = graft.streaming.GraftStreaming.sink(t)
      // two epochs of partial sketches, merged by the engine
      val src = tbl(s, dir, "events")
      (0 until 2).foreach { e =>
        sink(src.filter(col("user_id") % 2 === e)
          .groupBy("event_type")
          .agg(expr("hll_sketch_agg(user_id)").as("users")), e.toLong)
      }
      val exact = src.groupBy("event_type")
        .agg(countDistinct(col("user_id")).cast("long").as("exact_users"))
      t.read.select(col("event_type"),
          expr("hll_sketch_estimate(users)").as("approx_users"))
        .join(exact, "event_type")
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.05).as("within_bound"))
    },

    // ---- out-of-line BLOB storage: payloads above the inline
    // threshold live as content-addressed blob/ files, the parquet
    // holds descriptors, and the read re-inflates transparently —
    // verified byte-exact via md5 against the source text (reference:
    // BlobType.java / Blob.java descriptors).
    QDef(
      "x07_blob_storage",
      """SELECT doc_id, md5(text) AS h,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS len
        |FROM documents""".stripMargin) { (s, dir) =>
      val src = tbl(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      val t = GraftTable.create(s,
        Files.createTempDirectory("graft-x07-").toString + "/table",
        src.schema,
        options = Map("blob.columns" -> "media",
          "blob.inline-threshold" -> "512"))
      t.write(src)
      t.read.select(col("doc_id"), md5(col("media")).as("h"),
        length(col("media")).cast("long").as("len"))
    },

    // ---- Arrow interchange (reference: paimon-arrow): the orders
    // table distributes into self-contained Arrow IPC blobs and back;
    // the reassembled frame must hash-match plain SQL — any value
    // mangling in the vector writers/readers (timestamps, decimals,
    // nulls) shifts the hash.
    QDef(
      "x08_arrow_roundtrip",
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS price,
        |  CAST(o_orderdate AS TIMESTAMP) AS od
        |FROM orders""".stripMargin) { (s, dir) =>
      val ord = tbl(s, dir, "orders")
      val src = ord.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"),
        timestamp_micros(eventMicros(ord, "o_orderdate")).as("od"))
      val blobs = graft.sources.ArrowInterchange.toIpcBatches(src, 2048)
      graft.sources.ArrowInterchange.fromIpcBatches(s, blobs, src.schema)
        .select(col("o_orderkey"), col("o_orderstatus"),
          asDouble(col("o_totalprice")).as("price"),
          col("od").cast("timestamp_ntz").as("od"))
    })
}
