package graft.queries

import graft.streaming.GraftStreaming
import graft.table.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Streaming semantics inside the correctness gate. Micro-batch
  * epochs are simulated deterministically (event_id % 3) and driven
  * through the real exactly-once sink, and g49 drives the LIVE
  * Structured Streaming path (file source → writeStream.foreachBatch
  * → Trigger.AvailableNow) against the same oracle; StreamingSpec
  * covers the readStream source half.
  */
object Streams {

  private def scratch(name: String): String =
    Files.createTempDirectory(s"graft-$name-").toString + "/table"

  /** events with a TIMESTAMP `t` derived type-adaptively from ts (which
    * may surface as TIMESTAMP_NTZ or legacy LONG nanos — see
    * [[graft.queries.eventMicros]]). */
  private def events(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events")
    ev.withColumn("t", timestamp_micros(eventMicros(ev)))
  }

  val defs: Vector[QDef] = Vector(
    // ---- streaming upsert: 3 out-of-order epochs; sequence.field makes
    // the merged state arrival-order independent (late data handling).
    QDef(
      "g09_stream_upsert",
      """SELECT event_id, user_id, event_type, CAST(ROUND(value, 4) AS DOUBLE) AS value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      val ev = tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts"))
      val t = GraftTable.create(s, scratch("g09"), ev.schema,
        primaryKeys = Seq("user_id"),
        options = Map("sequence.field" -> "ts", "bucket" -> "4"))
      val sink = GraftStreaming.sink(t, watermarkColumn = Some("ts"))
      // epochs deliberately not aligned with event time → late arrivals
      (0 until 3).foreach(e => sink(ev.filter(col("event_id") % 3 === e), e.toLong))
      t.read.select(col("event_id"), col("user_id"), col("event_type"),
        asDouble(col("value"), 4).as("value"))
    },

    // ---- streaming windowed aggregation: tumbling 1-day windows
    // computed per epoch, combined by the aggregation merge engine
    // (sum-state combine) — the continuous-agg-into-upsert-sink shape.
    QDef(
      "g10_stream_window_agg",
      """SELECT date_trunc('day', ts) AS day, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val aggSchema = StructType(Seq(
        StructField("day", DateType, nullable = false),
        StructField("event_type", StringType, nullable = false),
        StructField("n", LongType, nullable = true),
        StructField("total", DecimalType(18, 4), nullable = true)))
      val t = GraftTable.create(s, scratch("g10"), aggSchema,
        primaryKeys = Seq("day", "event_type"),
        options = Map(
          "merge-engine" -> "aggregation",
          "fields.n.aggregate-function" -> "sum",
          "fields.total.aggregate-function" -> "sum",
          "bucket" -> "2"))
      val sink = GraftStreaming.sink(t)
      (0 until 3).foreach { e =>
        val batch = ev.filter(col("event_id") % 3 === e)
          .groupBy(window(col("t"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(18, 4)).as("total"))
          .select(col("window.start").cast("date").as("day"),
            col("event_type"), col("n"), col("total"))
        sink(batch, e.toLong)
      }
      t.read.select(col("day").cast("timestamp_ntz").as("day"),
        col("event_type"), col("n"), asDouble(col("total"), 4).as("total"))
    },

    // ---- streaming sink × postpone bucket: epochs stage with ZERO
    // shuffle into a bucket=-2 table and become visible exactly-once
    // when compaction assigns buckets — the reference's postpone tables
    // are precisely this streaming-ingest shape. Exactly-once is
    // tested sharply: epoch 1 is REPLAYED with corrupted values; the
    // commitIdentifier dedup must discard it, else the corruption wins
    // the merge (same ts, later commit). A post-compaction staged
    // epoch must stay invisible to the read.
    QDef(
      "g43_stream_postpone",
      """SELECT event_id, user_id, event_type, CAST(ROUND(value, 4) AS DOUBLE) AS value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      val ev = tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts"))
      val t = GraftTable.create(s, scratch("g43"), ev.schema,
        primaryKeys = Seq("user_id"),
        options = Map("sequence.field" -> "ts", "bucket" -> "-2",
          "postpone.default-bucket-num" -> "8"))
      val sink = GraftStreaming.sink(t, watermarkColumn = Some("ts"))
      (0 until 3).foreach(e => sink(ev.filter(col("event_id") % 3 === e), e.toLong))
      // replayed epoch with poisoned values: exactly-once must no-op it
      sink(ev.filter(col("event_id") % 3 === 1)
        .withColumn("value", col("value") * 1000), 1L)
      t.compact() // bucket assignment: the three epochs become visible
      // staged after the compact — must NOT appear in the read
      sink(ev.filter(col("event_id") % 3 === 2)
        .withColumn("value", col("value") * 1000), 99L)
      t.read.select(col("event_id"), col("user_id"), col("event_type"),
        asDouble(col("value"), 4).as("value"))
    },

    // ---- LIVE Structured Streaming ingest: a real
    // readStream(file source) → writeStream.foreachBatch(exactly-once
    // sink) → Trigger.AvailableNow run, not simulated epochs — the
    // engine's own micro-batch scheduler assigns batch ids and drives
    // the sink's commitIdentifier dedup. maxFilesPerTrigger=1 forces
    // one micro-batch per staged file; sequence.field merging makes
    // the final state independent of the (scheduler-chosen) file
    // pickup order, which is exactly what the oracle checks.
    QDef(
      "g49_stream_live",
      """SELECT event_id, user_id, event_type, CAST(ROUND(value, 4) AS DOUBLE) AS value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      val ev = tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts"))
      val srcDir = Files.createTempDirectory("graft-g49-src-").toString
      (0 until 3).foreach(e =>
        ev.filter(col("event_id") % 3 === e).coalesce(1)
          .write.mode("append").parquet(srcDir))
      val t = GraftTable.create(s, scratch("g49"), ev.schema,
        primaryKeys = Seq("user_id"),
        options = Map("sequence.field" -> "ts", "bucket" -> "4"))
      val sink = GraftStreaming.sink(t, watermarkColumn = Some("ts"))
      val q = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-g49-ck-").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epochId: Long) =>
          sink(batch.toDF(), epochId); ()
        }
        .start()
      q.awaitTermination()
      t.read.select(col("event_id"), col("user_id"), col("event_type"),
        asDouble(col("value"), 4).as("value"))
    },

    // ---- streaming lookup join, PARTIAL mode: per-epoch enrichment
    // of an orders stream against a PK customer dim table. The join
    // key covers the dim's primary key, so each epoch resolves ONLY
    // the buckets its keys hash into (reference:
    // PrimaryKeyPartialLookupTable) — never a full dim scan or
    // broadcast. Epoch 2 updates a dim slice first, so the gate also
    // proves per-epoch snapshot re-resolution: rows enriched in epoch
    // 0/1 keep the old segment, epoch-2 rows see the update.
    QDef(
      "g58_lookup_join",
      """SELECT o_orderkey, o_custkey AS c_custkey,
        |  CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS price, c_name,
        |  CASE WHEN o_orderkey % 3 = 2 AND c_custkey % 10 = 0
        |       THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin) { (s, dir) =>
      val cust = tbl(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val dim = GraftTable.create(s, scratch("g58dim"), cust.schema,
        primaryKeys = Seq("c_custkey"), options = Map("bucket" -> "8"))
      dim.write(cust)
      val orders = tbl(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          col("o_totalprice"))
      val enriched = (0 until 3).map { e =>
        if (e == 2) // dim refresh between epochs: next epoch must see it
          dim.mergeInto(cust.filter(col("c_custkey") % 10 === 0)
            .withColumn("c_mktsegment", lit("UPDATED")))
        GraftStreaming.lookupJoin(
          orders.filter(col("o_orderkey") % 3 === e), dim, Seq("c_custkey"),
          joinType = "inner")
      }
      enriched.reduce(_ unionByName _)
        .select(col("o_orderkey"), col("c_custkey"),
          asDouble(col("o_totalprice")).as("price"),
          col("c_name"), col("c_mktsegment"))
    },

    // ---- session windows (30-minute inactivity gap) per user.
    QDef(
      "g11_session_window",
      """WITH gaps AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM gaps)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sessions GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").cast("timestamp_ntz").as("session_start"),
          col("n_events"))
    })
}
