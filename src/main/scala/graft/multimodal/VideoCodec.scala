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
    * audio-only containers). The sample-table statistics aggregate every
    * track's `stbl` (`stsz` sizes, `stts` durations): `nSamples` and
    * `sampleBytes`/`maxSampleSize` from stsz, `mediaTicks` (sum of
    * count×delta) from stts — all 0 when no track carries a sample table
    * (metadata-only containers, e.g. the bare mvhd+tkhd fixtures). */
  final case class Mp4Meta(timescale: Long, durationTicks: Long, nTracks: Int,
      width: Int, height: Int, nSamples: Long = 0L, sampleBytes: Long = 0L,
      maxSampleSize: Long = 0L, mediaTicks: Long = 0L) {
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
    var nSamples = 0L
    var sampleBytes = 0L
    var maxSample = 0L
    var mediaTicks = 0L
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
              parseSampleTables(b, payload, boxEnd) match {
                case None => return None // present but malformed stbl
                case Some((n, bytes, mx, ticks)) =>
                  // per-track wrap guards don't cover the CROSS-track sums:
                  // two hostile tracks each near Long.MaxValue would wrap
                  // the accumulators negative — the same garbage-statistics
                  // outcome the per-field guards exist to prevent
                  try {
                    nSamples = Math.addExact(nSamples, n)
                    sampleBytes = Math.addExact(sampleBytes, bytes)
                    mediaTicks = Math.addExact(mediaTicks, ticks)
                  } catch { case _: ArithmeticException => return None }
                  maxSample = math.max(maxSample, mx)
              }
            case _ => ()
          }
          off = boxEnd
      }
    }
    if (timescale <= 0 || duration < 0 || nTracks == 0) None
    else Some(Mp4Meta(timescale, duration, nTracks, width, height,
      nSamples, sampleBytes, maxSample, mediaTicks))
  }

  /** Descend `trak → mdia → minf → stbl` and stream-aggregate the sample
    * tables: (n_samples, total_bytes, max_size) from `stsz`, total
    * count×delta ticks from `stts`. A track without the chain contributes
    * zeros (Some); a chain that IS present but truncated — declared entry
    * counts running past the box — is malformed input (None). Aggregation
    * is streaming: entry counts size nothing, so a hostile 2³²-entry
    * declaration cannot allocate. */
  /** First child box of type `tp` in [s, e): Right(Some(bounds)) = found,
    * Right(None) = genuinely absent, Left(()) = a child box is malformed —
    * absent means zero stats, malformed must poison the whole decode (a
    * corrupt container must not masquerade as a clean metadata-only one). */
  private def findChild(b: Array[Byte], tp: String, s: Long, e: Long): Either[Unit, Option[(Long, Long)]] = {
    var off = s
    while (off + 8 <= e) {
      boxBounds(b, off, e, allowToEnd = false) match {
        case None => return Left(())
        case Some((payload, boxEnd)) =>
          if (tag(b, off.toInt + 4) == tp) return Right(Some((payload, boxEnd)))
          off = boxEnd
      }
    }
    Right(None)
  }

  private[multimodal] def parseSampleTables(b: Array[Byte], start: Long, end: Long): Option[(Long, Long, Long, Long)] = {
    def descend(tp: String, s: Long, e: Long): Either[Unit, Option[(Long, Long)]] =
      findChild(b, tp, s, e)
    val stbl: Either[Unit, Option[(Long, Long)]] = for {
      mdia <- descend("mdia", start, end)
      minf <- mdia.map(m => descend("minf", m._1, m._2)).getOrElse(Right(None))
      stbl <- minf.map(m => descend("stbl", m._1, m._2)).getOrElse(Right(None))
    } yield stbl
    stbl match {
      case Left(()) => None // malformed child box anywhere on the path
      case Right(None) => Some((0L, 0L, 0L, 0L)) // no sample table: fine
      case Right(Some((s, e))) =>
        var n = 0L; var bytes = 0L; var mx = 0L; var ticks = 0L
        descend("stsz", s, e) match {
          case Left(()) => return None
          case Right(Some((p, pe))) =>
            if (p + 12 > pe) return None
            val uniform = u32(b, p.toInt + 4)
            val count = u32(b, p.toInt + 8)
            // nonsense-field guard: >2³¹ sample sizes/counts are not media,
            // and their Long products would wrap into garbage statistics
            if (uniform > Int.MaxValue || count > Int.MaxValue) return None
            n = count
            if (uniform != 0L) { bytes = uniform * count; mx = if (count > 0) uniform else 0L }
            else {
              if (p + 12 + count * 4 > pe) return None
              var i = 0L
              while (i < count) {
                val sz = u32(b, (p + 12 + i * 4).toInt)
                // same guard for PER-SAMPLE sizes, and wrap detection on
                // the running sum (terms are non-negative, so a negative
                // accumulator means the declared sizes overflowed int64)
                if (sz > Int.MaxValue) return None
                bytes += sz; if (bytes < 0) return None
                if (sz > mx) mx = sz
                i += 1
              }
            }
          case Right(None) => ()
        }
        descend("stts", s, e) match {
          case Left(()) => return None
          case Right(Some((p, pe))) =>
            if (p + 8 > pe) return None
            val entries = u32(b, p.toInt + 4)
            if (p + 8 + entries * 8 > pe) return None
            var i = 0L
            while (i < entries) {
              val cnt = u32(b, (p + 8 + i * 8).toInt)
              val delta = u32(b, (p + 8 + i * 8 + 4).toInt)
              if (cnt > Int.MaxValue || delta > Int.MaxValue) return None
              ticks += cnt * delta
              if (ticks < 0) return None // running-sum wrap
              i += 1
            }
          case Right(None) => ()
        }
        Some((n, bytes, mx, ticks))
    }
  }

  /** Materialized per-sample table of the FIRST track that carries an
    * `stbl` with an `stsz`: one entry per sample in presentation order,
    * `(size_bytes, byte_offset, start_tick, dur_ticks)` with byte offsets
    * cumulative over the track's samples (the contiguous single-chunk
    * layout the canonical writer produces; chunked files would add an
    * stco/stsc base, same seam). Same corrupt-never-throw contract as
    * [[decodeMp4]], plus one guard this MATERIALIZING walk needs that the
    * streaming aggregate doesn't: a declared sample count above
    * `maxSamples` is rejected — frame sampling addresses one asset at a
    * time, and a hostile 2³¹-entry `stsz` must not become a 2³¹-element
    * allocation. An stsz/stts count mismatch is malformed (None), per the
    * ISO-BMFF invariant that the tables describe the same samples. */
  def decodeMp4SampleTable(b: Array[Byte], maxSamples: Int = 1 << 16)
      : Option[IndexedSeq[(Long, Long, Long, Long)]] = {
    if (b == null || b.length < 16) return None
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
    moov.flatMap { case (s, e) => firstTrackSamples(b, s, e, maxSamples) }
  }

  private def firstTrackSamples(b: Array[Byte], start: Long, end: Long,
      maxSamples: Int): Option[IndexedSeq[(Long, Long, Long, Long)]] = {
    var off = start
    while (off + 8 <= end) {
      boxBounds(b, off, end, allowToEnd = false) match {
        case None => return None
        case Some((payload, boxEnd)) =>
          if (tag(b, off.toInt + 4) == "trak") {
            trackSamples(b, payload, boxEnd, maxSamples) match {
              case Left(()) => return None // malformed poisons the decode
              case Right(Some(tbl)) => return Some(tbl)
              case Right(None) => () // no sample table on this track
            }
          }
          off = boxEnd
      }
    }
    None
  }

  private def trackSamples(b: Array[Byte], start: Long, end: Long, maxSamples: Int)
      : Either[Unit, Option[IndexedSeq[(Long, Long, Long, Long)]]] = {
    val stblB = for {
      mdia <- findChild(b, "mdia", start, end)
      minf <- mdia.map(m => findChild(b, "minf", m._1, m._2)).getOrElse(Right(None))
      stbl <- minf.map(m => findChild(b, "stbl", m._1, m._2)).getOrElse(Right(None))
    } yield stbl
    stblB match {
      case Left(()) => Left(())
      case Right(None) => Right(None)
      case Right(Some((s, e))) =>
        findChild(b, "stsz", s, e) match {
          case Left(()) => Left(())
          case Right(None) => Right(None) // stbl without stsz: no samples
          case Right(Some((p, pe))) =>
            if (p + 12 > pe) return Left(())
            val uniform = u32(b, p.toInt + 4)
            val count = u32(b, p.toInt + 8)
            if (count > maxSamples || uniform > Int.MaxValue) return Left(())
            val n = count.toInt
            val sizes = new Array[Long](n)
            if (uniform != 0L) java.util.Arrays.fill(sizes, uniform)
            else {
              if (p + 12 + count * 4 > pe) return Left(())
              var i = 0
              while (i < n) {
                val sz = u32(b, (p + 12 + i.toLong * 4).toInt)
                if (sz > Int.MaxValue) return Left(())
                sizes(i) = sz
                i += 1
              }
            }
            val durs = new Array[Long](n)
            findChild(b, "stts", s, e) match {
              case Left(()) => return Left(())
              // stsz without stts cannot place samples in time: malformed
              // for a TIME-addressed walk (the aggregate path treats it as
              // zero ticks; here it would fabricate timestamps)
              case Right(None) => return Left(())
              case Right(Some((q, qe))) =>
                if (q + 8 > qe) return Left(())
                val entries = u32(b, q.toInt + 4)
                var i = 0L
                var si = 0
                while (i < entries) {
                  val base = q + 8 + i * 8
                  if (base + 8 > qe) return Left(())
                  val cnt = u32(b, base.toInt)
                  val delta = u32(b, base.toInt + 4)
                  if (cnt > Int.MaxValue || delta > Int.MaxValue) return Left(())
                  var j = 0L
                  while (j < cnt) {
                    if (si >= n) return Left(()) // stts over-declares
                    durs(si) = delta
                    si += 1; j += 1
                  }
                  i += 1
                }
                if (si != n) return Left(()) // stts under-declares
            }
            // cumulative offsets/ticks with the running-sum wrap guard
            val out = Vector.newBuilder[(Long, Long, Long, Long)]
            var byteOff = 0L
            var tick = 0L
            var i = 0
            while (i < n) {
              out += ((sizes(i), byteOff, tick, durs(i)))
              byteOff += sizes(i); if (byteOff < 0) return Left(())
              tick += durs(i); if (tick < 0) return Left(())
              i += 1
            }
            Right(Some(out.result()))
        }
    }
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
    * geometry-less (audio-shaped). With `samples = Some((n, sizeBase,
    * tickDelta))` the first track additionally carries a real
    * mdia→minf→stbl chain: a per-sample `stsz` with size
    * `sizeBase + (i % 7) · 17` for sample `i` (deterministic, non-uniform,
    * closed-form summable) and a two-entry `stts` — the first `n/2`
    * samples at `tickDelta` ticks, the rest at `2 · tickDelta`. */
  def encodeMp4(timescale: Int, durationTicks: Int, nTracks: Int, width: Int, height: Int,
      samples: Option[(Int, Int, Int)] = None): Array[Byte] = {
    require(timescale > 0 && durationTicks >= 0 && nTracks > 0, "invalid MP4 geometry")
    samples.foreach { case (n, base, delta) =>
      require(n >= 1 && base >= 0 && delta >= 1, "invalid sample-table geometry")
    }
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
    }) ++ sampleChain)
    def sampleChain: Array[Byte] = samples match {
      case None => Array.emptyByteArray
      case Some((n, base, delta)) =>
        val stsz = box("stsz", {
          val bb = java.nio.ByteBuffer.allocate(12 + 4 * n)
          bb.putInt(0).putInt(0).putInt(n) // version/flags, size=0 (per-sample), count
          (0 until n).foreach(i => bb.putInt(base + (i % 7) * 17))
          bb.array()
        })
        val stts = box("stts", {
          val n1 = n / 2
          val bb = java.nio.ByteBuffer.allocate(8 + 16)
          bb.putInt(0).putInt(2) // version/flags, entry_count
          bb.putInt(n1).putInt(delta).putInt(n - n1).putInt(2 * delta)
          bb.array()
        })
        box("mdia", box("minf", box("stbl", stsz ++ stts)))
    }
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
