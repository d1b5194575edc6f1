package graft.multimodal

/** Deterministic media-payload synthesis — real encoded bytes (PNG through
  * `javax.imageio`, RIFF/WAVE through `javax.sound.sampled`) whose decoded
  * properties are pure functions of the id, so a decode round-trip can be
  * oracle-checked by any engine that can evaluate the formulas (qm02).
  *
  * Same role as [[Mp4.buildHeader]] for video containers, but through actual
  * compression codecs: `decode(encode(formula(id))) == formula(id)` is the
  * testable contract, and it exercises the identical executor-side code path
  * ([[Multimodal.decodeFeatures]] + [[Multimodal.mediaDecode]]) that real
  * crawled media would take.
  */
object MediaFixtures {

  /** Payload for a document id — even ids get a gray PNG, odd ids a mono
    * 16-bit square-wave WAV. The formulas here are mirrored verbatim by the
    * qm02 oracle SQL; change both together.
    *  - PNG:  w = 16 + (id/2)%8, h = 12 + (id/2)%5, gray = (id%16)*16
    *  - WAV:  rate 8000 Hz, frames = 800 + id%97,
    *          amplitude = 8192 + (id%7)*1024, period 16 frames */
  def payload(id: Long): Array[Byte] =
    if (id % 2 == 0)
      png(16 + ((id / 2) % 8).toInt, 12 + ((id / 2) % 5).toInt, ((id % 16) * 16).toInt)
    else
      wavSquare(8000f, 800 + (id % 97).toInt, 8192 + (id % 7).toInt * 1024, 16)

  /** Solid-gray PNG of the given dimensions (lossless 8-bit RGB, so decoded
    * pixels — and hence mean luminance — reproduce the input exactly). */
  def png(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Mono s16le WAV: a ±amplitude square wave (high for the first half of
    * each period). Constant |sample| makes RMS and peak exactly
    * amplitude/32768 — a decoded-signal level the oracle can state. */
  def wavSquare(rate: Float, nFrames: Int, amplitude: Int, period: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = if ((i % period) * 2 < period) amplitude else -amplitude
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
