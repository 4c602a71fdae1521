package graft.queries

import graft.operators.Multimodal
import graft.table.GraftTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Multimodal-column queries: binary payload plumbing, frame sampling,
  * REAL image decode/resize/featurize (JDK ImageIO codecs against
  * closed-form pixel oracles), and ANALYZE statistics.
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

    // ---- REAL image decode + featurize: payloads are actual PNG/BMP
    // bytes (JDK ImageIO encoders) carrying an SQL-reproducible pixel
    // pattern, so the engine must round-trip a REAL codec while the
    // oracle recomputes every decoded statistic from the closed form —
    // gray(x,y) = ((id%131071)*31 + 7x + 13y) % 256 over id-derived
    // dimensions. Every output is one correctly-rounded double division
    // of exact integer sums (f0 additionally passes through FLOAT,
    // mirroring the features array's type), so the hash compare is
    // bit-exact. A codec that mangled one pixel shifts the sums.
    QDef(
      "x03_media_decode_features",
      """SELECT doc_id AS asset_id, TRUE AS ok,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(SUM(g) AS DOUBLE) / (w * h * 255) AS mean_intensity,
        |  CAST(CAST(CAST(SUM(CASE WHEN x * 8 < w THEN g ELSE 0 END) AS DOUBLE)
        |    / (SUM(CASE WHEN x * 8 < w THEN 1 ELSE 0 END) * 255) AS REAL) AS DOUBLE) AS f0
        |FROM (
        |  SELECT doc_id, w, h, x, y,
        |    ((doc_id % 131071) * 31 + 7 * x + 13 * y) % 256 AS g
        |  FROM (SELECT doc_id,
        |          ((doc_id % 131071) * 40503) % 24 + 8 AS w,
        |          ((doc_id % 131071) * 48271) % 24 + 8 AS h
        |        FROM documents) d,
        |    LATERAL unnest(generate_series(0, w - 1)) AS tx(x),
        |    LATERAL unnest(generate_series(0, h - 1)) AS ty(y))
        |GROUP BY doc_id, w, h""".stripMargin) { (s, dir) =>
      val assets = Multimodal.syntheticImages(tbl(s, dir, "documents"), "doc_id")
      Multimodal.decodeAndFeaturize(assets, dim = 8)
        .toDF()
        .select(col("asset_id"), col("ok"), col("width"), col("height"),
          col("mean_intensity"),
          element_at(col("features"), 1).cast("double").as("f0"))
    },

    // ---- REAL resize: decode the encoded payload, nearest-neighbor
    // resample to 24x24 with the pinned mapping ⌊x·w/24⌋, re-encode,
    // decode AGAIN and measure — the oracle recomputes the resampled
    // mean from the closed form, so the gate proves the whole
    // encode→decode→resample→encode→decode chain is pixel-exact.
    QDef(
      "x04_media_resize",
      """SELECT doc_id AS asset_id,
        |  CAST(24 AS INT) AS width, CAST(24 AS INT) AS height,
        |  CAST(SUM(((doc_id % 131071) * 31 + 7 * ((x * w) // 24)
        |            + 13 * ((y * h) // 24)) % 256) AS DOUBLE)
        |    / (24 * 24 * 255) AS mean_intensity
        |FROM (SELECT doc_id,
        |        ((doc_id % 131071) * 40503) % 24 + 8 AS w,
        |        ((doc_id % 131071) * 48271) % 24 + 8 AS h
        |      FROM documents) d,
        |  LATERAL unnest(generate_series(0, 23)) AS tx(x),
        |  LATERAL unnest(generate_series(0, 23)) AS ty(y)
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val assets = Multimodal.syntheticImages(tbl(s, dir, "documents"), "doc_id")
      Multimodal.decodeAndFeaturize(
        Multimodal.resize(assets, 24, 24), dim = 8)
        .toDF()
        .select(col("asset_id"), col("width"), col("height"),
          col("mean_intensity"))
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
