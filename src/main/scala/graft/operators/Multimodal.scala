package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: media as opaque
  * `binary` columns with typed metadata, processed batch-at-a-time inside
  * partitions. IMAGE decode is REAL — the JDK ships `javax.imageio`
  * (PNG/BMP/GIF/JPEG readers, zero extra dependencies), so
  * `decodeImage` parses actual pixels. AUDIO decode is REAL for WAV —
  * the JDK ships `javax.sound.sampled` (RIFF/WAVE PCM parsing, zero
  * extra dependencies), so `decodeWav` parses actual sample frames.
  * VIDEO container metadata decode is REAL (`decodeAvi`, a pure-JDK
  * RIFF/AVI parser) and frame-PIXEL decode is REAL for both codecs the
  * JDK can handle: MJPEG-in-AVI (`decodeAviFrames` — the `movi` `00dc`
  * chunks are plain JPEGs, read by `javax.imageio`) and RAW-DIB AVI
  * (`00db` chunks of bare uncompressed BGR rows, decoded against the
  * `strf` BITMAPINFOHEADER with pure arithmetic). Only compressed
  * non-MJPEG video codecs (and payloads the JDK codecs cannot parse)
  * fall back to `decodeStub`, a deterministic fake with the same
  * signature a JNI/FFmpeg decoder would have (this container ships no
  * other video codec libraries).
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

  /** Formats routed through the real WAV decoder. */
  private val AudioFormats = Set("audio", "wav")

  /** REAL WAV decode via the JDK's `javax.sound.sampled` — parses the
    * RIFF/WAVE header and PCM sample frames. Returns `(sample_rate,
    * channels, n_frames, mean_abs)` where `mean_abs` is the mean
    * absolute 16-bit sample value across all channels (exact integer
    * accumulation, one rounding at the end, like `decodeImage`). `None`
    * when the payload is not decodable 16-bit PCM WAV, so callers can
    * fall back.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val data = ais.readAllBytes()
          val big = fmt.isBigEndian
          var s = 0L
          var i = 0
          while (i + 1 < data.length) {
            val sample =
              if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            s += math.abs(sample.toLong)
            i += 2
          }
          val n = data.length / 2
          val mean = if (n == 0) 0.0 else s.toDouble / n
          Some((fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength,
            math.round(mean * 1000000d) / 1000000d))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode a constant-amplitude 16-bit PCM WAV (`nFrames` sample frames
    * at `sampleRate`, every sample = `amplitude`) with the JDK's WAVE
    * writer — the deterministic fixture generator for the real-decode
    * audio gate and specs.
    */
  def encodeWav(sampleRate: Int, nFrames: Int, amplitude: Short,
      channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
      /* signed = */ true, /* bigEndian = */ false)
    val data = new Array[Byte](nFrames * 2 * channels)
    var i = 0
    while (i < data.length) {
      data(i) = (amplitude & 0xff).toByte
      data(i + 1) = ((amplitude >> 8) & 0xff).toByte
      i += 2
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Encode a SQUARE-WAVE 16-bit mono PCM WAV: sample i is `+amplitude`
    * while `⌊i / halfPeriod⌋` is even, `−amplitude` otherwise — the
    * fixture whose per-frame RMS (= amplitude, exactly) and
    * zero-crossing rate (a pure integer formula of the window offset)
    * are analytically predictable.
    */
  def encodeSquareWav(sampleRate: Int, nFrames: Int, amplitude: Short,
      halfPeriod: Int): Array[Byte] = {
    require(halfPeriod >= 1, "halfPeriod must be >= 1")
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v: Int = if ((i / halfPeriod) % 2 == 0) amplitude else -amplitude
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Per-frame DSP features over 16-bit PCM WAV: RMS and zero-crossing
    * rate per non-overlapping `frameSize`-sample window (FULL windows
    * only, the deterministic boundary) — the classic audio-curation
    * features (silence gates, noise floors, speech/music heuristics).
    * Returns one `(frame_idx, rms, zcr)` per window; empty for
    * undecodable payloads. ZCR counts strict sign changes between
    * consecutive samples over `frameSize − 1` pairs.
    */
  def decodeWavFrames(bytes: Array[Byte], frameSize: Int): Seq[(Int, Double, Double)] = {
    require(frameSize >= 2, "frameSize must be >= 2")
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) Nil
        else {
          val data = ais.readAllBytes()
          val big = fmt.isBigEndian
          val n = data.length / 2
          def sample(i: Int): Int =
            if (big) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort.toInt
            else ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort.toInt
          val frames = Seq.newBuilder[(Int, Double, Double)]
          var f = 0
          while ((f + 1) * frameSize <= n) {
            val o = f * frameSize
            var sq = 0.0
            var changes = 0
            var j = 0
            while (j < frameSize) {
              val x = sample(o + j)
              sq += x.toDouble * x
              if (j > 0 && (x < 0) != (sample(o + j - 1) < 0) &&
                  x != 0 && sample(o + j - 1) != 0) changes += 1
              j += 1
            }
            val rms = math.sqrt(sq / frameSize)
            val zcr = changes.toDouble / (frameSize - 1)
            frames += ((f,
              math.round(rms * 1000000d) / 1000000d,
              math.round(zcr * 1000000d) / 1000000d))
            f += 1
          }
          frames.result()
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  final case class AudioFrame(
      doc_id: Long,
      frame_idx: Int,
      rms: Double,
      zcr: Double)

  /** Batched per-frame audio DSP over WAV payloads (same mapPartitions
    * shape as [[extractFeatures]]): PCM decodes in the scan stage, only
    * the small (idx, rms, zcr) rows flow on — samples never shuffle.
    */
  def extractAudioFrames(media: Dataset[MediaRow], frameSize: Int = 512,
      batchSize: Int = 64): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { row =>
      decodeWavFrames(row.media, frameSize).map { case (i, rms, zcr) =>
        AudioFrame(row.doc_id, i, rms, zcr)
      }
    }))
  }

  final case class AudioFeatures(
      doc_id: Long,
      n_bytes: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      duration_sec: Double,
      mean_abs: Double)

  /** Batched REAL audio feature extraction over WAV payloads (same
    * mapPartitions shape as `extractFeatures`; rows whose payload is not
    * decodable WAV are dropped — callers route undecodable audio through
    * the stubbed generic path instead). `duration_sec` is
    * frames / sample_rate, 6-decimal portable rounding.
    */
  def extractAudioFeatures(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { row =>
      decodeWav(row.media).map { case (rate, channels, frames, meanAbs) =>
        val dur = if (rate == 0) 0.0 else frames.toDouble / rate
        AudioFeatures(row.doc_id, row.media.length.toLong, rate, channels,
          frames, math.round(dur * 1000000d) / 1000000d, meanAbs)
      }
    }))
  }

  /** Formats routed through the real AVI container parser. */
  private val VideoFormats = Set("video", "avi")

  /** REAL video-container metadata decode — a pure-JDK RIFF/AVI parser
    * (no codec dependency exists in this environment, so frame PIXEL
    * decode stays stubbed, but the container walk is real: `RIFF`/`AVI `
    * magic, chunk traversal with word alignment, `LIST hdrl` descent,
    * and the 56-byte `avih` main header). Returns `(width, height,
    * total_frames, micro_sec_per_frame)`; `None` when the payload is
    * not a parsable AVI, so callers can fall back.
    */
  def decodeAvi(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    try {
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") None
      else {
        var result: Option[(Int, Int, Int, Long)] = None
        var off = 12
        var malformed = false
        while (result.isEmpty && !malformed && off + 8 <= bytes.length) {
          // u32 sizes above Int.MaxValue wrap negative; a negative (or
          // otherwise non-advancing) size would loop forever — bail out.
          val sz = u32(off + 4).toInt
          if (sz < 0) malformed = true
          else {
            if (fourcc(off) == "LIST" && off + 12 <= bytes.length &&
                fourcc(off + 8) == "hdrl") {
              val end = math.min(off + 8 + sz, bytes.length)
              var in = off + 12
              while (result.isEmpty && !malformed && in + 8 <= end) {
                val csz = u32(in + 4).toInt
                if (csz < 0) malformed = true
                else {
                  if (fourcc(in) == "avih" && csz >= 40 && in + 8 + csz <= bytes.length) {
                    result = Some((u32(in + 8 + 32).toInt, u32(in + 8 + 36).toInt,
                      u32(in + 8 + 16).toInt, u32(in + 8)))
                  }
                  val nextIn = in + 8 + csz + (csz & 1)
                  if (nextIn <= in) malformed = true else in = nextIn
                }
              }
            }
            val next = off + 8 + sz + (sz & 1)
            if (next <= off) malformed = true else off = next
          }
        }
        result
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode a minimal AVI container (RIFF + `LIST hdrl`/`avih` + empty
    * `LIST movi`) — the deterministic fixture generator for the real
    * container-decode video gate and specs.
    */
  def encodeAvi(width: Int, height: Int, totalFrames: Int,
      microSecPerFrame: Long): Array[Byte] =
    encodeMjpegAvi(width, height, Nil, microSecPerFrame, totalFrames)

  /** Encode an MJPEG AVI: the same RIFF/`hdrl`/`avih` skeleton as
    * [[encodeAvi]], but the `LIST movi` carries one `00dc` chunk per
    * frame, each a real JPEG (constant gray, encoded via
    * [[encodeImage]]'s ImageIO writer). `frameGrays` gives the per-frame
    * gray level; `totalFramesOverride` (only used by the header-only
    * twin) lets `encodeAvi` advertise frames it does not carry.
    */
  def encodeMjpegAvi(width: Int, height: Int, frameGrays: Seq[Int],
      microSecPerFrame: Long, totalFramesOverride: Int = -1): Array[Byte] = {
    val jpegs = frameGrays.map(g => encodeImage(width, height, g, "jpeg"))
    val moviPayload = jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val nFrames = if (totalFramesOverride >= 0) totalFramesOverride else frameGrays.length
    val buf = java.nio.ByteBuffer.allocate(100 + moviPayload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = buf.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    cc("RIFF"); buf.putInt(92 + moviPayload); cc("AVI ")
    cc("LIST"); buf.putInt(68); cc("hdrl")
    cc("avih"); buf.putInt(56)
    buf.putInt(microSecPerFrame.toInt) // dwMicroSecPerFrame
    buf.putInt(0); buf.putInt(0); buf.putInt(0) // maxBytesPerSec, padding, flags
    buf.putInt(nFrames); buf.putInt(0) // dwTotalFrames, dwInitialFrames
    buf.putInt(1); buf.putInt(0) // dwStreams, dwSuggestedBufferSize
    buf.putInt(width); buf.putInt(height)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0) // dwReserved
    cc("LIST"); buf.putInt(4 + moviPayload); cc("movi")
    jpegs.foreach { j =>
      cc("00dc"); buf.putInt(j.length); buf.put(j)
      if ((j.length & 1) == 1) buf.put(0.toByte) // RIFF word alignment
    }
    buf.array()
  }

  /** Encode a RAW-DIB AVI (uncompressed video): the RIFF/`hdrl`/`avih`
    * skeleton plus a proper `LIST strl` — `strh` (fccType 'vids',
    * handler 'DIB ') and `strf` (a 40-byte BITMAPINFOHEADER, 24 bpp,
    * BI_RGB) — and a `LIST movi` carrying one `00db` chunk per frame:
    * bottom-up BGR rows, each padded to a 4-byte boundary, exactly the
    * layout Video-for-Windows wrote. `frameGrays` gives each frame's
    * constant gray level. The fixture generator for the raw-frame
    * decode gate and specs.
    */
  def encodeRawDibAvi(width: Int, height: Int, frameGrays: Seq[Int],
      microSecPerFrame: Long): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val frameSize = rowSize * height
    val moviPayload = frameGrays.length * (8 + frameSize)
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val total = 12 + (8 + hdrlSize) + (8 + 4 + moviPayload)
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit =
      buf.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    cc("RIFF"); buf.putInt(total - 8); cc("AVI ")
    cc("LIST"); buf.putInt(hdrlSize); cc("hdrl")
    cc("avih"); buf.putInt(56)
    buf.putInt(microSecPerFrame.toInt)
    buf.putInt(0); buf.putInt(0); buf.putInt(0)
    buf.putInt(frameGrays.length); buf.putInt(0)
    buf.putInt(1); buf.putInt(0)
    buf.putInt(width); buf.putInt(height)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    cc("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); buf.putInt(56)
    cc("vids"); cc("DIB ")
    buf.putInt(0) // dwFlags
    buf.putShort(0); buf.putShort(0) // wPriority, wLanguage
    buf.putInt(0) // dwInitialFrames
    buf.putInt(microSecPerFrame.toInt); buf.putInt(1000000) // dwScale/dwRate
    buf.putInt(0); buf.putInt(frameGrays.length) // dwStart, dwLength
    buf.putInt(frameSize); buf.putInt(-1) // dwSuggestedBufferSize, dwQuality
    buf.putInt(frameSize) // dwSampleSize
    buf.putShort(0); buf.putShort(0) // rcFrame left, top
    buf.putShort(width.toShort); buf.putShort(height.toShort)
    cc("strf"); buf.putInt(40)
    buf.putInt(40) // biSize
    buf.putInt(width); buf.putInt(height)
    buf.putShort(1); buf.putShort(24) // biPlanes, biBitCount
    buf.putInt(0) // biCompression = BI_RGB
    buf.putInt(frameSize)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    cc("LIST"); buf.putInt(4 + moviPayload); cc("movi")
    frameGrays.foreach { g =>
      cc("00db"); buf.putInt(frameSize)
      val row = new Array[Byte](rowSize)
      java.util.Arrays.fill(row, 0, width * 3, g.toByte)
      var y = 0
      while (y < height) { buf.put(row); y += 1 }
    }
    buf.array()
  }

  /** The `strf` BITMAPINFOHEADER of the first video stream, if the
    * container declares one: (width, height, bitCount, compression).
    * Raw-DIB decode needs it — a `00db` chunk is BARE pixel data whose
    * geometry lives only here.
    */
  private def videoStreamFormat(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // walk: RIFF → LIST hdrl → LIST strl → strf
    def findIn(start: Int, end: Int, want: String, listType: String): Option[Int] = {
      var off = start
      while (off + 8 <= end) {
        val sz = u32(off + 4).toInt
        if (sz < 0) return None
        if (fourcc(off) == want &&
            (listType.isEmpty ||
              (off + 12 <= end && fourcc(off + 8) == listType)))
          return Some(off)
        val next = off + 8 + sz + (sz & 1)
        if (next <= off) return None
        off = next
      }
      None
    }
    try {
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") None
      else for {
        hdrl <- findIn(12, bytes.length, "LIST", "hdrl")
        hdrlEnd = math.min(hdrl + 8 + u32(hdrl + 4).toInt, bytes.length)
        strl <- findIn(hdrl + 12, hdrlEnd, "LIST", "strl")
        strlEnd = math.min(strl + 8 + u32(strl + 4).toInt, bytes.length)
        strf <- findIn(strl + 12, strlEnd, "strf", "")
        if u32(strf + 4).toInt >= 40 && strf + 8 + 40 <= bytes.length
      } yield (u32(strf + 12).toInt, u32(strf + 16).toInt,
        u16(strf + 22), u32(strf + 24).toInt)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Mean channel intensity of a bare 24-bpp bottom-up DIB frame
    * (`00db` payload): rows are `width*3` BGR bytes padded to 4-byte
    * boundaries; padding is excluded from the mean. None when the chunk
    * length does not match the declared geometry.
    */
  private def rawDibMean(bytes: Array[Byte], from: Int, len: Int,
      width: Int, height: Int): Option[Double] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    if (width <= 0 || height <= 0 || len != rowSize * height) None
    else {
      var s = 0L
      var y = 0
      while (y < height) {
        val base = from + y * rowSize
        var i = 0
        while (i < width * 3) { s += bytes(base + i) & 0xff; i += 1 }
        y += 1
      }
      val mean = s.toDouble / (3.0 * width * height)
      Some(math.round(mean * 1000000d) / 1000000d)
    }
  }

  /** REAL video frame-PIXEL decode for AVI — both codecs the JDK can
    * actually decode: MJPEG (`movi` `00dc` chunks are plain JPEGs, read
    * by `javax.imageio`) and RAW DIB (`00db` chunks are bare
    * uncompressed BGR rows, decoded against the `strf`
    * BITMAPINFOHEADER — pure arithmetic, no codec needed). Walks the
    * container with the same malformed-size guards as [[decodeAvi]].
    * Returns one `(frame_idx, width, height, mean_intensity)` per
    * decodable frame; empty when the payload is not an AVI or carries
    * no decodable video chunks (compressed non-MJPEG codecs — the
    * remaining honest fallback, there being no such codec in the JDK).
    */
  def decodeAviFrames(bytes: Array[Byte]): Seq[(Int, Int, Int, Double)] = {
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    try {
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") Nil
      else {
        // raw-DIB geometry, resolved once per container (None for
        // MJPEG-only files or containers without a strl header)
        lazy val dibFmt = videoStreamFormat(bytes).collect {
          case (w, h, 24, 0) => (w, math.abs(h)) // 24 bpp, BI_RGB
        }
        val frames = Seq.newBuilder[(Int, Int, Int, Double)]
        var idx = 0
        var off = 12
        var malformed = false
        while (!malformed && off + 8 <= bytes.length) {
          val sz = u32(off + 4).toInt
          if (sz < 0) malformed = true
          else {
            if (fourcc(off) == "LIST" && off + 12 <= bytes.length &&
                fourcc(off + 8) == "movi") {
              val end = math.min(off + 8 + sz, bytes.length)
              var in = off + 12
              while (!malformed && in + 8 <= end) {
                val csz = u32(in + 4).toInt
                if (csz < 0) malformed = true
                else {
                  // video chunks: '##dc' (compressed) / '##db' (uncompressed)
                  val cc = fourcc(in)
                  if ((cc.endsWith("dc") || cc.endsWith("db")) &&
                      in + 8 + csz <= bytes.length) {
                    // bare DIB pixels first when the container declares
                    // them (a '00db' payload is NOT an image file — its
                    // geometry lives in the strf header); anything else
                    // goes through the ImageIO codecs
                    val raw =
                      if (cc.endsWith("db")) dibFmt.flatMap { case (w, h) =>
                        rawDibMean(bytes, in + 8, csz, w, h)
                          .map(mean => (w, h, mean))
                      } else None
                    raw match {
                      case Some((w, h, mean)) => frames += ((idx, w, h, mean))
                      case None =>
                        decodeImage(java.util.Arrays.copyOfRange(bytes, in + 8, in + 8 + csz))
                          .foreach { case (w, h, _, mean) => frames += ((idx, w, h, mean)) }
                    }
                    idx += 1
                  }
                  val nextIn = in + 8 + csz + (csz & 1)
                  if (nextIn <= in) malformed = true else in = nextIn
                }
              }
            }
            val next = off + 8 + sz + (sz & 1)
            if (next <= off) malformed = true else off = next
          }
        }
        frames.result()
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  final case class VideoFrame(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      mean_intensity: Double)

  /** Batched REAL frame-pixel extraction over MJPEG-AVI payloads (same
    * mapPartitions shape as [[extractFeatures]]): container walk +
    * per-frame JPEG decode in the scan stage, only the small
    * (idx, w, h, mean) quads flow on — frame bytes never shuffle.
    */
  def extractVideoFrames(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { row =>
      decodeAviFrames(row.media).map { case (i, w, h, mean) =>
        VideoFrame(row.doc_id, i, w, h, mean)
      }
    }))
  }

  final case class VideoFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      fps: Double,
      duration_sec: Double)

  /** Batched REAL video-container feature extraction over AVI payloads
    * (same mapPartitions shape as `extractFeatures`; undecodable rows
    * are dropped — callers route them through the stubbed generic path
    * instead). `fps` = 1e6/µs-per-frame, `duration_sec` =
    * frames × µs-per-frame / 1e6 — both exact-integer-derived with one
    * 6-decimal portable rounding.
    */
  def extractVideoFeatures(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { row =>
      decodeAvi(row.media).map { case (w, h, frames, uspf) =>
        val fps = if (uspf == 0) 0.0 else math.round(1e6 / uspf * 1000000d) / 1000000d
        val dur = math.round(frames.toLong * uspf / 1e6 * 1000000d) / 1000000d
        VideoFeatures(row.doc_id, row.media.length.toLong, w, h, frames, fps, dur)
      }
    }))
  }

  /** Decode dispatch: image formats go through the real ImageIO path,
    * audio formats through the real WAV path, and video formats through
    * the real AVI container parser (stub fallback for payloads the
    * parsers cannot read — only frame PIXEL decode remains stubbed,
    * there being no video codec in the JDK). The non-image quads map
    * their notions onto the generic schema: WAV → (rate, channels,
    * sample frames, mean |sample|); AVI → (width, height, frames, fps)
    * ([[extractAudioFeatures]]/[[extractVideoFeatures]] are the typed
    * paths).
    */
  def decode(bytes: Array[Byte], format: String): (Int, Int, Int, Double) =
    if (ImageFormats(format)) decodeImage(bytes).getOrElse(decodeStub(bytes, format))
    else if (AudioFormats(format))
      decodeWav(bytes).map { case (rate, ch, frames, mean) =>
        (rate, ch, frames.toInt, mean)
      }.getOrElse(decodeStub(bytes, format))
    else if (VideoFormats(format))
      decodeAvi(bytes).map { case (w, h, frames, uspf) =>
        val fps = if (uspf == 0) 0.0 else math.round(1e6 / uspf * 1000000d) / 1000000d
        (w, h, frames, fps)
      }.getOrElse(decodeStub(bytes, format))
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
