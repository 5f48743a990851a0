package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: media as opaque
  * `binary` columns with typed metadata, processed batch-at-a-time inside
  * partitions. IMAGE decode is REAL — the JDK ships `javax.imageio`
  * (PNG/BMP/GIF/JPEG readers, zero extra dependencies), so
  * `decodeImage` parses actual pixels; audio/video decode and payloads
  * ImageIO cannot parse fall back to `decodeStub`, a deterministic fake
  * with the same signature a JNI/FFmpeg decoder would have (this
  * container ships no audio/video codec libraries). Swapping in a real
  * A/V decoder changes one function.
  *
  * Scale notes: media bytes never enter a shuffle — decode/feature
  * extraction happens in the same stage as the scan (`mapPartitions`),
  * and only small feature vectors/metadata flow onward. Partition sizing
  * for fat binary rows belongs to the scan
  * (`spark.sql.files.maxPartitionBytes`), not to a repartition of the
  * payload bytes.
  */
object Multimodal {

  // in-memory streams only: ImageIO's default disk cache would write a
  // temp file per decode inside executor tasks.
  javax.imageio.ImageIO.setUseCache(false)

  /** Formats routed through the real ImageIO decoder. */
  private val ImageFormats = Set("image", "png", "bmp", "gif", "jpeg")

  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      frames: Int,
      mean_intensity: Double)

  /** STUB decoder — deterministic fake of `decode(bytes) -> (w, h,
    * frames, pixels)`. A real implementation would call the codec here;
    * everything around it (batching, schema, metrics) is production
    * plumbing.
    */
  def decodeStub(bytes: Array[Byte], format: String): (Int, Int, Int, Double) = {
    val n = bytes.length
    val w = 16 + (n % 640)
    val h = 16 + ((n / 7) % 480)
    val frames = if (format == "video") 1 + (n % 24) else 1
    // "mean pixel intensity": mean of the raw bytes, unsigned
    var s = 0L; var i = 0
    while (i < n) { s += (bytes(i) & 0xff); i += 1 }
    val mean = if (n == 0) 0.0 else s.toDouble / n
    (w, h, frames, math.round(mean * 1000000d) / 1000000d)
  }

  /** REAL image decode via the JDK's `javax.imageio` — parses actual
    * pixels for PNG/BMP/GIF/JPEG payloads. Returns `(width, height,
    * frames=1, mean_intensity)` where mean intensity is the mean of all
    * RGB channel values (exact integer accumulation, one rounding at
    * the end, mirroring `decodeStub`'s contract). `None` when the
    * payload is not a decodable image, so callers can fall back.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var s = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      val mean = if (w.toLong * h == 0) 0.0 else s.toDouble / (3.0 * w * h)
      Some((w, h, 1, math.round(mean * 1000000d) / 1000000d))
    }
  }

  /** Encode a constant-gray `w × h` image with the JDK's ImageIO writers
    * (`codec` = "png" | "bmp" | ...) — the deterministic fixture
    * generator for the real-decode gate and specs.
    */
  def encodeImage(w: Int, h: Int, gray: Int, codec: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, codec, out), s"no ImageIO writer for $codec")
    out.toByteArray
  }

  /** Decode dispatch: image formats go through the real ImageIO path
    * (stub fallback for undecodable payloads); audio/video stay stubbed.
    */
  def decode(bytes: Array[Byte], format: String): (Int, Int, Int, Double) =
    if (ImageFormats(format)) decodeImage(bytes).getOrElse(decodeStub(bytes, format))
    else decodeStub(bytes, format)

  /** Batch feature extraction: one pass per partition, rows processed in
    * `batchSize` groups (the arrow-batch shape a Pandas-UDF pipeline
    * would use), media bytes dropped before anything downstream.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val (w, h, f, mean) = decode(row.media, row.format)
          MediaFeatures(row.doc_id, row.format, row.media.length.toLong, w, h, f, mean)
        }
      }
    }
  }

  final case class ResizedMedia(doc_id: Long, format: String,
      width: Int, height: Int, media: Array[Byte])
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB resize — a real implementation would decode, scale, re-encode;
    * the stub deterministically re-buckets the bytes to the target
    * dimensions so downstream schema/size behavior is realistic.
    */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(bytes.length, (w.toLong * h / 64).toInt))
    java.util.Arrays.copyOf(bytes, target)
  }

  /** Batched resize over the media table (same mapPartitions shape). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { row =>
      ResizedMedia(row.doc_id, row.format, w, h, resizeStub(row.media, w, h))
    }))
  }

  /** Frame sampling for video rows: the stub treats the payload as
    * `frames` equal byte chunks (per `decodeStub`'s frame count) and
    * keeps every `everyN`-th chunk. One row out per sampled frame; frame
    * bytes never shuffle (sampled in the scan stage, small chunks flow
    * on).
    */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int = 4,
      batchSize: Int = 64): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.format == "video").mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { row =>
      val (_, _, frames, _) = decodeStub(row.media, row.format)
      val size = math.max(1, row.media.length / math.max(frames, 1))
      (0 until frames by everyN).map { k =>
        val from = k * size
        val until = math.min(row.media.length, from + size)
        Frame(row.doc_id, k, java.util.Arrays.copyOfRange(row.media, from, math.max(from, until)))
      }
    }))
  }

  /** Stand-in media table derived from `documents` (UTF-8 bytes as the
    * opaque payload; format assigned deterministically) — the test
    * corpus for the plumbing until a real media lake exists.
    *
    * Deliberately a pure projection: the media bytes stay in the scan
    * stage (no count action, no repartition) so every downstream
    * mapPartitions decode runs in the same stage as the read. Partition
    * sizing for fat binary rows is the scan's knob
    * (`spark.sql.files.maxPartitionBytes`), exactly as it would be on a
    * real media lake.
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"))
      .as[MediaRow]
  }

  /** Full pipeline as a DataFrame op: documents → media → features. */
  def features(spark: SparkSession, documents: DataFrame): DataFrame =
    extractFeatures(mediaFromDocuments(spark, documents)).toDF()
}
