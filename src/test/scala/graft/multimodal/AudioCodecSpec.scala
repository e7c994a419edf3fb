package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class AudioCodecSpec extends AnyFunSuite {

  private def wav(sampleRate: Int, channels: Int, bits: Int, frames: Int): Array[Byte] =
    AudioCodec.encodeWav(sampleRate, channels, bits, frames)

  test("encodeWav rejects invalid geometry") {
    intercept[IllegalArgumentException](AudioCodec.encodeWav(0, 1, 16, 10))
    intercept[IllegalArgumentException](AudioCodec.encodeWav(8000, 1, 12, 10))
  }

  test("decodes PCM WAV metadata exactly") {
    val m = AudioCodec.decodeWav(wav(16000, 2, 16, 8000)).get
    assert(m == AudioCodec.WavMeta(16000, 2, 16, 8000L))
    assert(m.durationMs == 500L)
  }

  test("tolerates extra chunks before fmt/data") {
    val base = wav(44100, 1, 16, 441)
    // splice a 10-byte LIST chunk between WAVE and fmt
    val bb = java.nio.ByteBuffer.allocate(base.length + 18)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(base, 0, 12)
      .put("LIST".getBytes("US-ASCII")).putInt(10).put(new Array[Byte](10))
      .put(base, 12, base.length - 12)
    val m = AudioCodec.decodeWav(bb.array()).get
    assert(m.sampleRate == 44100 && m.nFrames == 441L)
  }

  test("corrupt inputs return None, never throw") {
    val good = wav(8000, 1, 8, 100)
    assert(AudioCodec.decodeWav(null).isEmpty)
    assert(AudioCodec.decodeWav(Array.empty[Byte]).isEmpty)
    assert(AudioCodec.decodeWav("not a wav at all, just text bytes padded out to 44+".getBytes).isEmpty)
    assert(AudioCodec.decodeWav(good.take(30)).isEmpty)          // truncated header
    val badAlign = good.clone(); badAlign(32) = 0; badAlign(33) = 0 // blockAlign = 0
    assert(AudioCodec.decodeWav(badAlign).isEmpty)
    val hugeChunk = good.clone()
    // declare a pre-data junk chunk so large the offset would overflow
    val bb = java.nio.ByteBuffer.allocate(good.length + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(good, 0, 12)
      .put("junk".getBytes("US-ASCII")).putInt(0x7fffffff)
      .put(good, 12, good.length - 12)
    assert(AudioCodec.decodeWav(bb.array()).isEmpty)
    assert(hugeChunk.nonEmpty)
  }

  test("fuzz: random and bit-flipped blobs never throw") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val blob = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(blob)
      AudioCodec.decodeWav(blob) // must not throw; result is irrelevant
    }
    val good = wav(16000, 2, 16, 50)
    for (_ <- 1 to 500) {
      val mutated = good.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      AudioCodec.decodeWav(mutated)
    }
  }

  test("truncated data chunk reports the frames actually present") {
    val full = wav(8000, 1, 16, 100) // declares 200 data bytes
    val cut = full.take(44 + 50)     // only 25 frames really present
    val m = AudioCodec.decodeWav(cut).get
    assert(m.nFrames == 25L)
  }
}
