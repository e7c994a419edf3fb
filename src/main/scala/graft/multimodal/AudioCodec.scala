package graft.multimodal

/** Pure-JVM audio container parser: RIFF/WAVE header → (sample rate,
  * channels, bit depth, frame count). PCM WAV is the uncompressed audio
  * counterpart of [[ImageCodec]]'s PPM/BMP tier — parsed directly with no
  * native dependency; compressed codecs (MP3/AAC/Opus via ffmpeg) slot
  * into the same per-partition seam at deployment.
  *
  * Corrupt-header contract (same as ImageCodec): decode returns None on
  * anything malformed — wrong magic, truncated chunks, nonsense field
  * values, declared sizes that overflow or exceed the payload — and never
  * throws or allocates proportionally to an attacker-controlled field. */
object AudioCodec {

  /** Parsed WAV metadata; `nFrames` counts sample frames (all channels). */
  final case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int, nFrames: Long) {
    def durationMs: Long = nFrames * 1000L / sampleRate
  }

  /** Minimal canonical PCM WAV writer (44-byte header + silence frames):
    * the fixture/synthesis counterpart of [[decodeWav]], used to exercise
    * the decode path end-to-end over deterministic payloads. */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int, frames: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && frames >= 0, "invalid WAV geometry")
    require(bitsPerSample > 0 && bitsPerSample % 8 == 0, "bitsPerSample must be a positive byte multiple")
    val blockAlign = channels * bitsPerSample / 8
    // size the payload in Long space: frames * blockAlign in Int arithmetic
    // would wrap negative around 2^31 and throw from the allocator instead
    // of reporting the real problem
    require(frames.toLong * blockAlign <= Int.MaxValue.toLong - 44,
      s"WAV payload ${frames.toLong * blockAlign} bytes exceeds the 2 GiB single-buffer limit")
    val dataLen = frames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** [[encodeWav]] with a deterministic ramp tone instead of silence:
    * data byte `j` is `(seed + j) % 256`. Gives the payload-feature pass
    * ([[Multimodal.audioPcm]]) a non-trivial amplitude distribution that
    * an external oracle can regenerate arithmetically. */
  def encodeWavRamp(sampleRate: Int, channels: Int, bitsPerSample: Int,
      frames: Int, seed: Int): Array[Byte] = {
    val b = encodeWav(sampleRate, channels, bitsPerSample, frames)
    var j = 44
    while (j < b.length) { b(j) = ((seed + j - 44) & 0xff).toByte; j += 1 }
    b
  }

  /** (offset, length) of the PCM payload inside a WAV that [[decodeWav]]
    * accepts — the codec's frame-extraction seam. Same corrupt-never-throw
    * contract: None unless the header is fully valid; length is clamped to
    * the bytes actually present (truncated uploads). */
  def dataChunk(b: Array[Byte]): Option[(Int, Int)] =
    decodeWav(b).flatMap { _ =>
      var off = 12
      var found: Option[(Int, Int)] = None
      var bail = false
      while (!bail && found.isEmpty && off + 8 <= b.length) {
        val tag = new String(b, off, 4, "US-ASCII")
        val declared = (b(off + 4) & 0xffL) | ((b(off + 5) & 0xffL) << 8) |
          ((b(off + 6) & 0xffL) << 16) | ((b(off + 7) & 0xffL) << 24)
        if (tag == "data")
          found = Some((off + 8, math.min(declared, (b.length - off - 8).toLong).toInt))
        else {
          val nextOff = off.toLong + 8L + declared + (declared & 1L)
          if (nextOff > Int.MaxValue.toLong) bail = true
          else off = nextOff.toInt
        }
      }
      found
    }

  /** Count of full-scale (clipped) samples in a PCM slice: 8-bit PCM is
    * unsigned (0 / 255 are the rails), wider depths are signed
    * little-endian (±2^(8w-1) rails). Samples straddling a truncated tail
    * are ignored. Depths wider than 8 bytes are not PCM; returns 0. */
  def clippedSamples(b: Array[Byte], off: Int, len: Int, bitsPerSample: Int): Long = {
    val w = bitsPerSample / 8
    if (w < 1 || w > 8) return 0L
    var clipped = 0L
    if (w == 1) {
      var i = off
      while (i < off + len) {
        val v = b(i) & 0xff
        if (v == 0 || v == 255) clipped += 1
        i += 1
      }
    } else {
      val max = (1L << (8 * w - 1)) - 1
      val min = -(1L << (8 * w - 1))
      var i = off
      while (i + w <= off + len) {
        var v = 0L
        var j = w - 1
        while (j >= 0) { v = (v << 8) | (b(i + j) & 0xffL); j -= 1 }
        // sign-extend from 8w bits
        val shifted = v << (64 - 8 * w)
        val s = shifted >> (64 - 8 * w)
        if (s == max || s == min) clipped += 1
        i += w
      }
    }
    clipped
  }

  def decodeWav(b: Array[Byte]): Option[WavMeta] = {
    if (b == null || b.length < 44) return None
    def tag(off: Int): String = new String(b, off, 4, "US-ASCII")
    def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var blockAlign = -1
    var dataLen = -1L
    while (off + 8 <= b.length && (sampleRate < 0 || dataLen < 0)) {
      val id = tag(off)
      val declared = u32(off + 4)
      if (id == "fmt ") {
        if (off + 8 + 16 > b.length) return None
        channels = u16(off + 10)
        sampleRate = u32(off + 12).toInt
        blockAlign = u16(off + 20)
        bits = u16(off + 22)
      } else if (id == "data") {
        // trust the payload, not the declared size: a truncated upload's
        // data chunk claims more bytes than exist
        dataLen = math.min(declared, (b.length - off - 8).toLong)
      }
      // advance only when another chunk is still needed: a huge declared
      // size on the LAST needed chunk must not trip the overflow bail.
      // Advancing in Long space keeps a hostile size from wrapping the
      // offset negative; word-aligned per the RIFF spec.
      if (sampleRate < 0 || dataLen < 0) {
        val nextOff = off.toLong + 8L + declared + (declared & 1L)
        if (nextOff > Int.MaxValue.toLong) return None
        off = nextOff.toInt
      }
    }
    if (sampleRate <= 0 || channels <= 0 || blockAlign <= 0 || bits <= 0 || dataLen < 0) None
    else Some(WavMeta(sampleRate, channels, bits, dataLen / blockAlign))
  }
}
