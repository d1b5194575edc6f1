package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, and partition-parallel decode/feature
  * pipelines.
  *
  * The Spark-side machinery here is real and tested — schema contract,
  * batch-iterator decode over `mapPartitions` (the JVM analogue of a Pandas
  * `mapInPandas` batch UDF: one decoder instance per partition, streaming
  * row batches through it), partition sizing — while the codec itself is a
  * real for images too: `imageDecode` decodes PNG/JPEG/GIF/BMP through JDK
  * `javax.imageio` (no external codec libraries needed), and falls back to
  * the deterministic byte-hash `fakeDecode` for non-image binary (audio/
  * video codecs are not in the JDK). Swapping in a heavier decoder changes
  * only `decodeFn`.
  */
// Serializable: passing a decoder method (e.g. `Multimodal.mediaDecode`) as
// a `decodeFn` value eta-expands to a lambda that captures this module
// instance, which then rides inside the mapPartitions closure to executors.
object Multimodal extends Serializable {

  // ImageIO defaults to a disk-backed stream cache: every read of an
  // in-memory payload would create/write/delete a temp file on the executor.
  // Payloads here are always byte arrays, so cache in memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** Canonical media-table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
    )), nullable = false),
  ))

  /** Wrap raw binary rows into the media schema (metadata inferred from the
    * payload; format sniffed from real magic bytes). PNG width/height are
    * parsed straight out of the IHDR header with codegen'd expressions
    * (bytes 17-20 / 21-24 big-endian) — no UDF, no decode pass; JPEG dims
    * require a segment scan, so they come from [[imageDecode]]. */
  def asMediaTable(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val b = col(binCol)
    val magic = substring(b, 1, 4).cast("string")
    val isPng = hex(substring(b, 1, 8)) === lit("89504E470D0A1A0A")
    val isJpeg = hex(substring(b, 1, 3)) === lit("FFD8FF")
    // ISO-BMFF: 'ftyp' at bytes 5-8 (the [[Mp4]] signature, sniffed in SQL)
    val isMp4 = substring(b, 5, 4).cast("string") === lit("ftyp")
    // IHDR dims live at bytes 17-24; a truncated PNG must yield null dims,
    // not whatever conv() makes of a short hex string
    val hasIhdr = isPng && octet_length(b) >= lit(24)
    df.select(
      col(idCol).cast("long").as("media_id"),
      b.as("payload"),
      struct(
        when(isPng, "png").when(isJpeg, "jpeg")
          .when(isMp4, "mp4")
          .when(magic.startsWith("PNG"), "png")
          .when(magic.startsWith("RIFF"), "riff")
          .otherwise("raw").as("format"),
        when(hasIhdr, conv(hex(substring(b, 17, 4)), 16, 10).cast("int"))
          .otherwise(lit(null).cast("int")).as("width"),
        when(hasIhdr, conv(hex(substring(b, 21, 4)), 16, 10).cast("int"))
          .otherwise(lit(null).cast("int")).as("height"),
        octet_length(b).cast("long").as("n_bytes"),
      ).as("meta"))
  }

  /** Real image decoder — JDK `javax.imageio` (PNG/JPEG/GIF/BMP, zero new
    * dependencies). Features: [width, height, mean luminance, 4 quadrant
    * luminance means], zero-padded/truncated to featureDim. Non-image
    * payloads fall back to [[fakeDecode]] so arbitrary binary still flows
    * end-to-end (and the driver's text-payload tables keep their exact
    * feature values from previous rounds). */
  def imageDecode(payload: Array[Byte], featureDim: Int): Array[Float] = {
    if (payload == null) return Array.empty
    // magic-byte gate: ImageIO's reader discovery costs ~1 ms per attempt,
    // which is a 15x slowdown when most payloads are not images — only
    // plausible image bytes reach the codec (bench qm02: 6.3 s -> 0.4 s)
    if (!looksLikeImage(payload)) return fakeDecode(payload, featureDim)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) return fakeDecode(payload, featureDim)
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](5); val counts = new Array[Long](5)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)) / 255.0
        val q = 1 + (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
        sums(0) += lum; counts(0) += 1
        sums(q) += lum; counts(q) += 1
        x += 1
      }
      y += 1
    }
    val stats = Array(w.toFloat, h.toFloat) ++
      sums.indices.map(i => if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
    Array.tabulate(featureDim)(i => if (i < stats.length) stats(i) else 0f)
  }

  /** PNG / JPEG / GIF / BMP signature check — the formats JDK ImageIO ships
    * readers for. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M'))

  /** RIFF/WAVE signature — the format JDK javax.sound ships a reader for. */
  private def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Real audio decoder — JDK `javax.sound.sampled` (WAV/PCM, zero new
    * dependencies). Decodes to signed 16-bit PCM and emits
    * [sampleRate, channels, nFrames, rms, peak, zeroCrossingRate],
    * zero-padded/truncated to featureDim. Non-WAV payloads fall back to
    * [[fakeDecode]] (MP3/AAC/OGG codecs are not in the JDK). */
  def audioDecode(payload: Array[Byte], featureDim: Int): Array[Float] = {
    if (payload == null) return Array.empty
    if (!looksLikeWav(payload)) return fakeDecode(payload, featureDim)
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val pcmFmt = new javax.sound.sampled.AudioFormat(
        fmt.getSampleRate, 16, fmt.getChannels, true, false) // s16le
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, ais)
      val bytes = pcm.readAllBytes()
      val n = bytes.length / 2
      val ch = math.max(1, fmt.getChannels)
      // RMS/peak are channel-agnostic (power over all samples); zero
      // crossings must stride by channel — consecutive samples in the
      // interleaved stream belong to DIFFERENT channels, and mixing L/R
      // transitions fabricates crossings neither channel has
      var sumSq = 0.0; var peak = 0.0; var zc = 0L
      var c = 0
      while (c < ch) {
        var prev = 0; var first = true
        var i = c
        while (i < n) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
          val x = s / 32768.0
          sumSq += x * x
          if (math.abs(x) > peak) peak = math.abs(x)
          if (!first && ((s < 0) != (prev < 0))) zc += 1
          prev = s; first = false
          i += ch
        }
        c += 1
      }
      val frames = n / ch
      // AudioSystem.NOT_SPECIFIED is -1: never emit it as a sample rate
      val rate = if (fmt.getSampleRate < 0) 0f else fmt.getSampleRate
      val zcDenom = (frames - 1).toLong * ch // per-channel transitions summed
      val stats = Array(rate, fmt.getChannels.toFloat, frames.toFloat,
        if (n == 0) 0f else math.sqrt(sumSq / n).toFloat, peak.toFloat,
        if (zcDenom <= 0) 0f else (zc.toDouble / zcDenom).toFloat)
      Array.tabulate(featureDim)(i => if (i < stats.length) stats(i) else 0f)
    } catch { case _: Exception => fakeDecode(payload, featureDim) }
  }

  /** Combined media decoder: real JDK codecs where they exist (images via
    * ImageIO, WAV audio via javax.sound), container-header metadata for MP4
    * video ([[Mp4.parse]] — the JDK has no video codec, so features are
    * [duration_s, timescale, n_tracks, width, height], not frame content),
    * deterministic fallback elsewhere. The default `decodeFn` for
    * [[decodeFeatures]] callers that carry mixed payload types. */
  def mediaDecode(payload: Array[Byte], featureDim: Int): Array[Float] =
    if (payload == null) Array.empty
    else if (looksLikeImage(payload)) imageDecode(payload, featureDim)
    else if (looksLikeWav(payload)) audioDecode(payload, featureDim)
    else if (Mp4.looksLikeMp4(payload)) Mp4.parse(payload) match {
      case Some(m) =>
        val stats = Array(m.durationSeconds.toFloat, m.timescale.toFloat,
          m.nTracks.toFloat, m.width.toFloat, m.height.toFloat)
        Array.tabulate(featureDim)(i => if (i < stats.length) stats(i) else 0f)
      case None => fakeDecode(payload, featureDim)
    }
    else fakeDecode(payload, featureDim)

  /** Video container metadata as columns: parse each payload's MP4 header
    * ([[Mp4.parse]], a bounds-checked pure-JVM atom walk — no codec, no
    * frame decode) in a partition-parallel narrow map. Non-MP4 payloads get
    * a null struct; the row is never dropped. */
  def videoMeta(media: DataFrame): DataFrame = {
    val vSchema = StructType(Seq(
      StructField("brand", StringType, nullable = true),
      StructField("duration_s", DoubleType, nullable = false),
      StructField("timescale", LongType, nullable = false),
      StructField("n_tracks", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val outSchema = StructType(media.schema.fields :+
      StructField("video", vSchema, nullable = true))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val v = Mp4.parse(r.getAs[Array[Byte]](payloadIdx)).map(m =>
          Row(m.majorBrand, m.durationSeconds, m.timescale, m.nTracks,
            m.width, m.height)).orNull
        Row.fromSeq(r.toSeq :+ v)
      }
    }
  }

  /** Deterministic pseudo-feature fallback for binary that no JDK codec can
    * decode (audio/video/raw): stable hash-derived output keeps those
    * pipelines end-to-end testable. Images take the real [[imageDecode]]
    * path above. */
  def fakeDecode(payload: Array[Byte], featureDim: Int): Array[Float] = {
    if (payload == null) return Array.empty
    var h = 1125899906842597L // FNV-ish rolling state over the payload
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    Array.tabulate(featureDim) { j =>
      val x = h ^ (j.toLong * 0x9e3779b97f4a7c15L)
      ((x % 1000L).toFloat) / 1000.0f
    }
  }

  /** Partition-parallel decode: one decoder per partition, rows streamed
    * through it — the batch shape a heavyweight codec needs (model/codec
    * init amortized per partition, not per row). */
  def decodeFeatures(media: DataFrame, featureDim: Int = 16,
                     decodeFn: (Array[Byte], Int) => Array[Float] = imageDecode): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handle, model, ...)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ decodeFn(payload, featureDim))
      }
    }
  }

  /** Frame sampling stub: pick n deterministic byte-offset "frames" from the
    * payload (a video decoder would seek; the slicing/explode plumbing is the
    * real part). Returns one row per sampled frame. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val total = col("meta.n_bytes")
    media.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset", (col("frame_idx") * total / lit(n)).cast("long"))
      .withColumn("frame", expr(s"substring(payload, cast(frame_offset as int) + 1, 16)"))
  }
}
