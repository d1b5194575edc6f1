package graft.multimodal

/** Pure-JVM MP4 (ISO base media file format, ISO/IEC 14496-12) METADATA
  * reader — an honest-scope video capability: the JDK ships no video codec,
  * so frames stay undecoded ([[Multimodal.fakeDecode]] covers feature
  * pipelines), but the container header is plain big-endian structure and
  * parsing it needs no codec at all.
  *
  * Box model: a file is a sequence of `[u32 size][4cc type][payload]` boxes
  * (size==1 → u64 largesize follows the type; size==0 → box runs to EOF).
  * The walk here reads `ftyp` (major brand), then inside `moov`:
  *  - `mvhd` (movie header): timescale (units/second) + duration (units),
  *    v0 = 32-bit fields, v1 = 64-bit times/duration;
  *  - each `trak`'s `tkhd` (track header): 16.16 fixed-point presentation
  *    width/height — the first track with non-zero dims supplies the frame
  *    size (audio tracks carry 0×0).
  *
  * Every read is bounds-checked; any malformed structure yields None rather
  * than an exception — corpus binary columns contain arbitrary junk and a
  * metadata pass must never kill a task over one bad payload.
  */
object Mp4 {

  /** Parsed container metadata (no frame decode — see scaladoc). */
  final case class Meta(majorBrand: String, timescale: Long, durationUnits: Long,
                        nTracks: Int, width: Int, height: Int) {
    def durationSeconds: Double =
      if (timescale <= 0) 0.0 else durationUnits.toDouble / timescale
  }

  /** `ftyp` at bytes 4-7 — the ISO-BMFF signature. */
  def looksLikeMp4(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  private def u32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
      ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)

  private def u64(p: Array[Byte], off: Int): Long =
    (u32(p, off) << 32) | u32(p, off + 4)

  private def fourcc(p: Array[Byte], off: Int): String =
    new String(p, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Walk the boxes of p[start, end): invoke f(type, payloadStart,
    * payloadEnd) per box; f returns false to stop early. Malformed
    * sizes (too small / past end / truncated header) stop the walk. */
  private def walk(p: Array[Byte], start: Int, end: Int)
                  (f: (String, Int, Int) => Boolean): Unit = {
    var off = start
    var continue = true
    while (continue && off + 8 <= end) {
      val size32 = u32(p, off)
      val typ = fourcc(p, off + 4)
      var payloadOff = off + 8L
      val boxEnd: Long =
        if (size32 == 0L) end.toLong // box runs to end of enclosing space
        else if (size32 == 1L) {
          if (off + 16 > end) return
          payloadOff = off + 16L
          off + u64(p, off + 8)
        } else off + size32
      if (boxEnd < payloadOff || boxEnd > end) return
      continue = f(typ, payloadOff.toInt, boxEnd.toInt)
      if (boxEnd.toInt <= off) return // no forward progress on junk sizes
      off = boxEnd.toInt
    }
  }

  /** Parse container metadata; None when p is not ISO-BMFF or the needed
    * headers are absent/malformed. */
  def parse(p: Array[Byte]): Option[Meta] = {
    if (!looksLikeMp4(p)) return None
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var width = 0
    var height = 0
    walk(p, 0, p.length) { (typ, s, e) =>
      typ match {
        case "ftyp" if e - s >= 4 => brand = fourcc(p, s)
        case "moov" =>
          walk(p, s, e) { (t2, s2, e2) =>
            t2 match {
              case "mvhd" if e2 - s2 >= 4 =>
                val v = p(s2) & 0xff
                // v0: ver/flags 4, times 2x4, timescale 4, duration 4
                // v1: ver/flags 4, times 2x8, timescale 4, duration 8
                if (v == 0 && e2 - s2 >= 20) {
                  timescale = u32(p, s2 + 12); duration = u32(p, s2 + 16)
                } else if (v == 1 && e2 - s2 >= 32) {
                  timescale = u32(p, s2 + 20); duration = u64(p, s2 + 24)
                }
              case "trak" =>
                nTracks += 1
                walk(p, s2, e2) { (t3, s3, e3) =>
                  if (t3 == "tkhd" && e3 - s3 >= 4) {
                    val v = p(s3) & 0xff
                    // width/height are the LAST two u32s (16.16 fixed):
                    // v0 payload = 84 bytes, v1 = 96
                    val need = if (v == 0) 84 else 96
                    if (e3 - s3 >= need && width == 0 && height == 0) {
                      val w = (u32(p, s3 + need - 8) >> 16).toInt
                      val h = (u32(p, s3 + need - 4) >> 16).toInt
                      if (w > 0 && h > 0) { width = w; height = h }
                    }
                  }
                  true
                }
              case _ =>
            }
            true
          }
        case _ =>
      }
      true
    }
    if (timescale < 0 && nTracks == 0) None
    else Some(Meta(Option(brand).getOrElse(""), math.max(timescale, 0L),
      math.max(duration, 0L), nTracks, width, height))
  }

  // ---- synthetic header builder (tests + oracle round-trip queries) ----

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length)
    out.put(typ.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.put(payload)
    out.array()
  }

  /** Build a minimal valid MP4 header: ftyp + moov(mvhd + nTracks×trak(tkhd)).
    * The first track carries the given 16.16 fixed-point dims, the rest are
    * 0×0 (the audio-track shape). Deterministic — the round-trip oracle
    * (build from a formula, [[parse]], compare to the formula in SQL)
    * depends on it. */
  def buildHeader(brand: String, timescale: Long, durationUnits: Long,
                  nTracks: Int, width: Int, height: Int): Array[Byte] = {
    require(brand.length == 4, s"brand must be a 4cc, got '$brand'")
    val ftyp = {
      val b = java.nio.ByteBuffer.allocate(12)
      b.put(brand.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      b.putInt(0x200) // minor_version
      b.put("mp42".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      box("ftyp", b.array())
    }
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version 0 + flags
      b.putInt(0); b.putInt(0) // creation/modification
      b.putInt(timescale.toInt)
      b.putInt(durationUnits.toInt)
      b.putInt(0x00010000) // rate 1.0
      b.putShort(0x0100.toShort) // volume 1.0
      b.position(b.position() + 10) // reserved
      for (m <- Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)) b.putInt(m) // unity matrix
      b.position(b.position() + 24) // pre_defined
      b.putInt(nTracks + 1) // next_track_ID
      box("mvhd", b.array())
    }
    val traks = (0 until nTracks).map { i =>
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0x000007) // version 0, flags: enabled|in_movie|in_preview
      b.putInt(0); b.putInt(0) // creation/modification
      b.putInt(i + 1) // track_ID
      b.putInt(0) // reserved
      b.putInt(durationUnits.toInt)
      b.position(b.position() + 8) // reserved
      b.putShort(0.toShort); b.putShort(0.toShort) // layer, alternate_group
      b.putShort(if (i == 0) 0.toShort else 0x0100.toShort) // volume (audio tracks)
      b.putShort(0.toShort) // reserved
      for (m <- Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)) b.putInt(m)
      b.putInt(if (i == 0) width << 16 else 0) // 16.16 fixed
      b.putInt(if (i == 0) height << 16 else 0)
      box("trak", box("tkhd", b.array()))
    }
    val moov = box("moov", (Seq(mvhd) ++ traks).reduce(_ ++ _))
    ftyp ++ moov
  }
}
