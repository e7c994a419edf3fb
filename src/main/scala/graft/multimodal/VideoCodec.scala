package graft.multimodal

/** Pure-JVM video container parser: ISO-BMFF (MP4) box walk →
  * (timescale, duration, track count, display geometry). The box
  * structure carries all the metadata a curation pipeline filters on
  * (duration, resolution, track layout) without touching a single
  * compressed sample, so this tier needs no native codec; frame-level
  * decode (H.264/AV1 via ffmpeg) slots into the same per-partition seam
  * at deployment, exactly like the compressed tiers of [[ImageCodec]]
  * and [[AudioCodec]].
  *
  * Corrupt-header contract (same as the other codecs): decode returns
  * None on anything malformed — short input, absurd box sizes, missing
  * or truncated `moov`/`mvhd` — and never throws or allocates
  * proportionally to an attacker-controlled field. Box offsets advance
  * in Long space so hostile 32-bit sizes cannot wrap them negative. */
object VideoCodec {

  /** Parsed MP4 metadata. `width`/`height` are the display geometry of
    * the first track that declares one (0 when no track does, e.g.
    * audio-only containers). */
  final case class Mp4Meta(timescale: Long, durationTicks: Long, nTracks: Int, width: Int, height: Int) {
    def durationMs: Long = durationTicks * 1000L / timescale
  }

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def tag(b: Array[Byte], off: Int): String = new String(b, off, 4, "US-ASCII")

  /** (payloadStart, boxEnd) of the box whose header begins at `off`, or
    * None if the header is malformed / runs past `limit`. `size == 1`
    * means a 64-bit largesize follows the type; `size == 0` (box runs
    * to end of file) is only legal at top level and is normalized to
    * `limit` by the caller passing `allowToEnd`. */
  private def boxBounds(b: Array[Byte], off: Long, limit: Long, allowToEnd: Boolean): Option[(Long, Long)] = {
    if (off + 8 > limit) return None
    val size = u32(b, off.toInt)
    if (size == 0L) {
      if (allowToEnd) Some((off + 8, limit)) else None
    } else if (size == 1L) {
      if (off + 16 > limit) return None
      val large = u64(b, off.toInt + 8)
      if (large < 16 || off + large > limit) None else Some((off + 16, off + large))
    } else if (size < 8 || off + size > limit) None
    else Some((off + 8, off + size))
  }

  def decodeMp4(b: Array[Byte]): Option[Mp4Meta] = {
    if (b == null || b.length < 16) return None
    // an MP4 must open with a well-formed box; require the conventional
    // ftyp first so arbitrary binaries don't "decode" by accident
    if (tag(b, 4) != "ftyp") return None
    val limit = b.length.toLong
    var off = 0L
    var moov: Option[(Long, Long)] = None
    while (off + 8 <= limit && moov.isEmpty) {
      boxBounds(b, off, limit, allowToEnd = true) match {
        case None => return None
        case Some((payload, end)) =>
          if (tag(b, off.toInt + 4) == "moov") moov = Some((payload, end))
          off = end
      }
    }
    moov.flatMap { case (moovStart, moovEnd) => parseMoov(b, moovStart, moovEnd) }
  }

  private def parseMoov(b: Array[Byte], start: Long, end: Long): Option[Mp4Meta] = {
    var off = start
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var width = 0
    var height = 0
    while (off + 8 <= end) {
      boxBounds(b, off, end, allowToEnd = false) match {
        case None => return None
        case Some((payload, boxEnd)) =>
          tag(b, off.toInt + 4) match {
            case "mvhd" =>
              // FullBox: payload[0] = version; v0 packs timescale/duration
              // as u32 after two u32 timestamps, v1 after two u64s
              if (payload + 4 > boxEnd) return None
              val v = b(payload.toInt) & 0xff
              if (v == 0) {
                if (payload + 20 > boxEnd) return None
                timescale = u32(b, payload.toInt + 12)
                duration = u32(b, payload.toInt + 16)
              } else if (v == 1) {
                if (payload + 32 > boxEnd) return None
                timescale = u32(b, payload.toInt + 20)
                duration = u64(b, payload.toInt + 24)
              } else return None
            case "trak" =>
              nTracks += 1
              if (width == 0) {
                findTkhdGeometry(b, payload, boxEnd).foreach { case (w, h) =>
                  width = w; height = h
                }
              }
            case _ => ()
          }
          off = boxEnd
      }
    }
    if (timescale <= 0 || duration < 0 || nTracks == 0) None
    else Some(Mp4Meta(timescale, duration, nTracks, width, height))
  }

  /** Display geometry from a trak's tkhd, if present and nonzero.
    * Width/height sit after the 36-byte transform matrix as 16.16
    * fixed-point; the integer part is what pipelines filter on. */
  private def findTkhdGeometry(b: Array[Byte], start: Long, end: Long): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      boxBounds(b, off, end, allowToEnd = false) match {
        case None => return None
        case Some((payload, boxEnd)) =>
          if (tag(b, off.toInt + 4) == "tkhd") {
            if (payload + 4 > boxEnd) return None
            val v = b(payload.toInt) & 0xff
            val geomOff = if (v == 0) payload + 76 else if (v == 1) payload + 88 else return None
            if (geomOff + 8 > boxEnd) return None
            val w = (u32(b, geomOff.toInt) >> 16).toInt
            val h = (u32(b, geomOff.toInt + 4) >> 16).toInt
            return if (w > 0 && h > 0) Some((w, h)) else None
          }
          off = boxEnd
      }
    }
    None
  }

  /** Minimal canonical MP4 writer (ftyp + moov(mvhd, trak(tkhd)×n)):
    * the fixture/synthesis counterpart of [[decodeMp4]]. The first
    * track carries the display geometry; any additional tracks are
    * geometry-less (audio-shaped). */
  def encodeMp4(timescale: Int, durationTicks: Int, nTracks: Int, width: Int, height: Int): Array[Byte] = {
    require(timescale > 0 && durationTicks >= 0 && nTracks > 0, "invalid MP4 geometry")
    require(width > 0 && height > 0 && width < (1 << 15) && height < (1 << 15), "invalid display geometry")
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tp.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.put("isom".getBytes("US-ASCII")).putInt(512)
        .put("isom".getBytes("US-ASCII")).put("iso2".getBytes("US-ASCII"))
      bb.array()
    })
    val mvhd = box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(100) // version-0 mvhd payload
      bb.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(durationTicks)
        .putInt(0x00010000).putShort(0x0100.toShort) // rate, volume
      bb.position(36)
      bb.putInt(0x00010000).position(52); bb.putInt(0x00010000).position(68)
      bb.putInt(0x40000000) // identity matrix diagonal
      bb.position(96); bb.putInt(0) // next_track_ID slot
      bb.array()
    })
    def tkhd(trackId: Int, w: Int, h: Int): Array[Byte] = box("trak", box("tkhd", {
      val bb = java.nio.ByteBuffer.allocate(84) // version-0 tkhd payload
      bb.putInt(7).putInt(0).putInt(0).putInt(trackId).putInt(0).putInt(durationTicks)
      bb.position(40)
      bb.putInt(0x00010000).position(56); bb.putInt(0x00010000).position(72)
      bb.putInt(0x40000000)
      bb.position(76)
      bb.putInt(w << 16).putInt(h << 16)
      bb.array()
    }))
    val traks = (1 to nTracks).map { i =>
      if (i == 1) tkhd(i, width, height)
      else box("trak", box("tkhd", {
        val bb = java.nio.ByteBuffer.allocate(84)
        bb.putInt(7).putInt(0).putInt(0).putInt(i).putInt(0).putInt(durationTicks)
        bb.array() // zero geometry: audio-shaped track
      }))
    }
    val moov = box("moov", (mvhd +: traks).reduce(_ ++ _))
    ftyp ++ moov
  }
}
