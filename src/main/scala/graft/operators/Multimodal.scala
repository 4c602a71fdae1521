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
  * library/codec initialization amortizes). The image kernels are REAL
  * `javax.imageio` codecs (PNG/BMP/JPEG readers, PNG/BMP writers — the
  * JDK's own, headless-safe); undecodable payloads flow through the
  * explicit failure channel (`ok=false` / empty payload) instead of
  * failing the job. Audio/video codecs are not in the JDK — video
  * frame handling stays at the container level ([[sampleFrames]]'
  * binary slicing).
  */
object Multimodal {

  /** Typed media asset row (payload + metadata). */
  case class MediaAsset(
      asset_id: Long,
      format: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Decoded/featurized result of one asset. `width`/`height` are the
    * DECODED dimensions (evidence the codec really ran, checkable
    * against the metadata). */
  case class MediaFeatures(
      asset_id: Long,
      ok: Boolean,
      n_bytes: Long,
      width: Int,
      height: Int,
      mean_intensity: Double,
      features: Array[Float])

  val mediaSchema: StructType = Encoders.product[MediaAsset].schema

  /** Integer ITU-R BT.601 luma in [0, 255]: (299r + 587g + 114b)/1000.
    * Exact (= the channel value) on gray pixels, which keeps the
    * synthetic-pattern oracle integral. */
  @inline private def luma(rgb: Int): Long = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (299L * r + 587L * g + 114L * b) / 1000L
  }

  @inline private def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    if (payload == null || payload.isEmpty) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }

  @inline private def encodeImage(
      img: java.awt.image.BufferedImage, format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** REAL encoded images with an SQL-reproducible pixel pattern:
    * gray(x, y) = ((id % 131071)·31 + 7x + 13y) mod 256 over
    * id-derived dimensions, written as actual PNG/BMP (both lossless,
    * so an oracle engine can recompute every decoded statistic from
    * the closed form while the engine under test must round-trip the
    * REAL codec). The id arithmetic mirrors [[syntheticAssets]]'
    * portable-modular construction. */
  def syntheticImages(df: DataFrame, idCol: String): Dataset[MediaAsset] = {
    val spark = df.sparkSession
    import spark.implicits._
    // Codec work is CPU-dense per input byte — a byte-sized split policy
    // under-parallelizes it (guide §2.5: repartition right after a
    // too-coarse read). The id rows being shuffled are 8 bytes each, so
    // spreading them across the cluster's cores before the encode is
    // ~free — UNCONDITIONALLY (r18): the previous partition-count probe
    // (`ids0.rdd.getNumPartitions`) forced the physical plan, which
    // under AQE can execute upstream query stages just to read a count,
    // and then the repartition branch computed the upstream plan AGAIN
    // for the write — a double-execution trap for any non-trivial input.
    val ids = df.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
    ids.mapPartitions { it =>
      it.map { id =>
        val idm = id % 131071L
        val w = ((idm * 40503L) % 24L).toInt + 8
        val h = ((idm * 48271L) % 24L).toInt + 8
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = ((idm * 31L + 7L * x + 13L * y) % 256L).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val fmt = if (id % 2 == 0) "png" else "bmp"
        MediaAsset(id, fmt, w, h, encodeImage(img, fmt))
      }
    }
  }

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

  /** REAL image decode + feature extraction: `payload` decodes through
    * `javax.imageio` (PNG/BMP/JPEG and whatever readers the JVM
    * registers), then one pass over the pixels computes integer-luma
    * statistics:
    *  - `mean_intensity` = Σ luma / (w·h·255) in [0, 1];
    *  - `features(j)` = the mean of vertical stripe j (pixels with
    *    ⌊x·dim/w⌋ = j), a crude but real spatial signature.
    * All sums are integral and each output is ONE correctly-rounded
    * double division of exact integers, so an oracle engine decoding
    * nothing can still reproduce every value from the synthetic
    * pattern's closed form. Undecodable/empty payloads surface as
    * `ok=false` rows (the failure channel), never task failures. */
  def decodeAndFeaturize(assets: Dataset[MediaAsset], dim: Int = 8): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    require(dim > 0, "dim must be positive")
    assets.mapPartitions { it =>
      // ImageIO reader instances are found per call; plugin scanning
      // happens once per JVM — the per-partition iterator is where a
      // heavier extractor would hold its handle
      it.map { a =>
        val nb = if (a.payload == null) 0L else a.payload.length.toLong
        val img = decodeImage(a.payload)
        if (img == null) {
          MediaFeatures(a.asset_id, ok = false, nb, 0, 0, 0.0, Array.fill(dim)(0.0f))
        } else {
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L
          val stripeSum = new Array[Long](dim)
          val stripeN = new Array[Long](dim)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val l = luma(img.getRGB(x, y))
              sum += l
              val j = x * dim / w
              stripeSum(j) += l; stripeN(j) += 1
              x += 1
            }
            y += 1
          }
          val mean = sum.toDouble / (w.toLong * h * 255L).toDouble
          val feats = Array.tabulate(dim)(j =>
            if (stripeN(j) == 0L) 0.0f
            else (stripeSum(j).toDouble / (stripeN(j) * 255L).toDouble).toFloat)
          MediaFeatures(a.asset_id, ok = true, nb, w, h, mean, feats)
        }
      }
    }
  }

  /** REAL resize: decode, nearest-neighbor resample with the exact
    * mapping dst(x, y) = src(⌊x·w/newWidth⌋, ⌊y·h/newHeight⌋), and
    * re-encode in the asset's own format. The mapping is pinned (not
    * delegated to Graphics2D scaling, whose sample positions are
    * implementation-defined) so resized pixel statistics stay
    * reproducible by an oracle engine. Undecodable payloads keep their
    * metadata with an EMPTY payload — the explicit failure channel. */
  def resize(assets: Dataset[MediaAsset], newWidth: Int, newHeight: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    require(newWidth > 0 && newHeight > 0, "target dimensions must be positive")
    assets.mapPartitions { it =>
      it.map { a =>
        val img = decodeImage(a.payload)
        if (img == null) a.copy(payload = Array.emptyByteArray)
        else {
          val w = img.getWidth; val h = img.getHeight
          val out = new java.awt.image.BufferedImage(
            newWidth, newHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < newHeight) {
            val sy = y * h / newHeight
            var x = 0
            while (x < newWidth) {
              out.setRGB(x, y, img.getRGB(x * w / newWidth, sy) & 0xffffff)
              x += 1
            }
            y += 1
          }
          // JDK ImageIO writes png and bmp; other read-only input
          // formats (e.g. jpeg payloads) re-encode losslessly as png
          val fmt = if (a.format == "png" || a.format == "bmp") a.format else "png"
          MediaAsset(a.asset_id, fmt, newWidth, newHeight, encodeImage(out, fmt))
        }
      }
    }
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
