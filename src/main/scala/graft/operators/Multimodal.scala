package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines.
  *
  * Design: media is an opaque `BinaryType` payload column plus typed
  * metadata columns (format/width/height/...), exactly how a 100 TB
  * lake stores assets next to text. Decode/resize are necessarily
  * library calls — they run via `Dataset.mapPartitions` (the Scala
  * analog of mapInPandas: one iterator per partition, so per-batch
  * library/model initialization amortizes). The image/audio codecs are
  * NOT available in this environment, so the decode kernels are
  * STUBBED with clearly-marked deterministic fakes — the schema,
  * partitioning, batch shape, and operator plumbing are real and
  * tested; swapping the stub for a real codec changes only the
  * function body.
  */
object Multimodal {

  /** Typed media asset row (payload + metadata). */
  case class MediaAsset(
      asset_id: Long,
      format: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Decoded/featurized result of one asset. */
  case class MediaFeatures(
      asset_id: Long,
      ok: Boolean,
      n_bytes: Long,
      mean_intensity: Double,
      features: Array[Float])

  val mediaSchema: StructType = Encoders.product[MediaAsset].schema

  /** Build a deterministic synthetic media table from any source table
    * (payload = UTF-8 bytes of a text column) — the test stand-in for
    * real image ingestion. */
  def syntheticAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("png"), lit("jpeg"), lit("webp")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("format"),
      // dimensions from engine-portable modular arithmetic (NOT
      // xxhash64): any SQL engine can reproduce them, which lets the
      // resize gate carry a full value oracle. The pre-mod bounds the
      // product away from BIGINT overflow under ANSI.
      (pmod(pmod(col(idCol).cast("long"), lit(131071L)) * 40503L, lit(512L)) + 32L)
        .cast("int").as("width"),
      (pmod(pmod(col(idCol).cast("long"), lit(131071L)) * 48271L, lit(512L)) + 32L)
        .cast("int").as("height"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** ===== STUB ===== image decode + feature extraction.
    *
    * Real implementation would decode `payload` with an image codec
    * and run a feature extractor. This deterministic fake derives
    * "pixel statistics" from the payload bytes so the distributed
    * plumbing (mapPartitions batching, schema, failure channel `ok`)
    * is fully exercisable without codecs.
    */
  def decodeAndFeaturize(assets: Dataset[MediaAsset], dim: Int = 8): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init happens here (codec/model handles in a real impl)
      it.map { a =>
        if (a.payload == null || a.payload.isEmpty) {
          MediaFeatures(a.asset_id, ok = false, 0L, 0.0, Array.fill(dim)(0.0f))
        } else {
          // ??? real codec+extractor goes here; the fake derives
          // "pixel statistics" from engine-portable modular arithmetic
          // over the asset id and payload byte length (the same
          // construction as the synthetic dimensions above), so the
          // correctness gate carries a FULL SQL value oracle: every
          // output is k/4096 with 0 <= k < 4096 — exactly
          // representable in float and double alike, in any engine.
          val nb = a.payload.length.toLong
          val idm = a.asset_id % 131071L
          val mean = ((idm * 48271L + nb % 131071L) % 4096L).toDouble / 4096.0
          val feats = Array.tabulate(dim) { j =>
            (((idm * (40503L + j) + nb % 131071L) % 4096L).toDouble / 4096.0).toFloat
          }
          MediaFeatures(a.asset_id, ok = true, nb, mean, feats)
        }
      }
    }
  }

  /** ===== STUB ===== resize: real impl transforms pixels; the fake
    * truncates the payload proportionally so downstream size
    * accounting behaves like a real resize. Metadata is updated for
    * real. */
  def resize(assets: DataFrame, newWidth: Int, newHeight: Int): DataFrame = {
    val scale = (lit(newWidth) * lit(newHeight)).cast("double") /
      greatest(col("width") * col("height"), lit(1)).cast("double")
    assets
      .withColumn("payload",
        expr(s"substring(payload, 1, greatest(cast(ceil(length(payload) * " +
          s"least((cast($newWidth as double) * $newHeight) / (width * height), 1.0)) as int), 1))"))
      .withColumn("width", lit(newWidth))
      .withColumn("height", lit(newHeight))
  }

  /** Frame sampling for "video" payloads: treat the payload as
    * fixed-size frames, keep every `everyN`-th. Pure codegen'd binary
    * slicing — no UDF, no shuffle. */
  def sampleFrames(
      assets: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    assets.select(col("asset_id"),
      posexplode(filter(
        transform(
          sequence(lit(0L), expr(s"cast((length(payload) - 1) div $frameBytes as long)")),
          i => when(pmod(i, lit(everyN)) === 0,
            struct(i.as("frame_no"),
              col("payload").substr((i * frameBytes + 1).cast("int"),
                lit(frameBytes)).as("frame")))
            .otherwise(lit(null))),
        x => x.isNotNull)).as(Seq("pos", "f")))
      .select(col("asset_id"), col("f.frame_no").as("frame_no"),
        col("f.frame").as("frame"),
        length(col("f.frame")).cast("long").as("frame_len"))
}
