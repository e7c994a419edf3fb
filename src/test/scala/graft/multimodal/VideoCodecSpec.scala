package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class VideoCodecSpec extends AnyFunSuite {

  test("decodes encoded MP4 metadata exactly") {
    val m = VideoCodec.decodeMp4(VideoCodec.encodeMp4(30000, 90000, 2, 1920, 1080)).get
    assert(m == VideoCodec.Mp4Meta(30000L, 90000L, 2, 1920, 1080))
    assert(m.durationMs == 3000L)
  }

  test("audio-shaped extra tracks don't override the display geometry") {
    val m = VideoCodec.decodeMp4(VideoCodec.encodeMp4(1000, 500, 3, 640, 480)).get
    assert(m.nTracks == 3 && m.width == 640 && m.height == 480)
  }

  test("tolerates a free box and an mdat between ftyp and moov") {
    val base = VideoCodec.encodeMp4(600, 1200, 1, 320, 240)
    val ftypLen = java.nio.ByteBuffer.wrap(base, 0, 4).getInt
    def box(tp: String, n: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + n)
      bb.putInt(8 + n).put(tp.getBytes("US-ASCII")).put(new Array[Byte](n))
      bb.array()
    }
    val spliced = base.take(ftypLen) ++ box("free", 12) ++ box("mdat", 40) ++ base.drop(ftypLen)
    val m = VideoCodec.decodeMp4(spliced).get
    assert(m.timescale == 600L && m.durationTicks == 1200L && m.width == 320)
  }

  test("corrupt inputs return None, never throw") {
    val good = VideoCodec.encodeMp4(1000, 1000, 1, 320, 240)
    assert(VideoCodec.decodeMp4(null).isEmpty)
    assert(VideoCodec.decodeMp4(Array.empty[Byte]).isEmpty)
    assert(VideoCodec.decodeMp4("plain text bytes, definitely not a movie".getBytes).isEmpty)
    assert(VideoCodec.decodeMp4(good.take(20)).isEmpty)           // truncated moov
    val badSize = good.clone()
    // corrupt the moov box size to a value larger than the payload
    val ftypLen = java.nio.ByteBuffer.wrap(good, 0, 4).getInt
    java.nio.ByteBuffer.wrap(badSize, ftypLen, 4).putInt(Int.MaxValue)
    assert(VideoCodec.decodeMp4(badSize).isEmpty)
    val tinyBox = good.clone()
    java.nio.ByteBuffer.wrap(tinyBox, ftypLen, 4).putInt(4)       // size < 8
    assert(VideoCodec.decodeMp4(tinyBox).isEmpty)
  }

  test("decodeMp4SampleTable materializes the first track's samples with cumulative offsets/ticks") {
    val n = 11; val base = 20; val delta = 100
    val bytes = VideoCodec.encodeMp4(600, 6000, 2, 640, 480, samples = Some((n, base, delta)))
    val tbl = VideoCodec.decodeMp4SampleTable(bytes).get
    assert(tbl.length == n)
    var off = 0L; var tick = 0L
    for (i <- 0 until n) {
      val size = base + (i % 7) * 17L
      val dur = if (i < n / 2) delta.toLong else 2L * delta
      assert(tbl(i) == ((size, off, tick, dur)), s"sample $i: ${tbl(i)}")
      off += size; tick += dur
    }
    // metadata-only container: no sample table to materialize
    assert(VideoCodec.decodeMp4SampleTable(
      VideoCodec.encodeMp4(600, 6000, 1, 320, 240)).isEmpty)
    // oversized declared count is rejected, not allocated
    assert(VideoCodec.decodeMp4SampleTable(bytes, maxSamples = n - 1).isEmpty)
    // corrupt bytes: never throw
    assert(VideoCodec.decodeMp4SampleTable(null).isEmpty)
    assert(VideoCodec.decodeMp4SampleTable(bytes.take(40)).isEmpty)
    // an stts whose run totals disagree with stsz is malformed: find the
    // stts entry_count field and shrink it so the runs under-declare
    val sttsAt = {
      var i = 0
      var found = -1
      while (found < 0 && i + 8 <= bytes.length) {
        if (new String(bytes, i + 4, 4, "US-ASCII") == "stts") found = i
        i += 1
      }
      found
    }
    assert(sttsAt > 0)
    val mismatched = bytes.clone()
    java.nio.ByteBuffer.wrap(mismatched, sttsAt + 12, 4).putInt(1) // one run only
    assert(VideoCodec.decodeMp4SampleTable(mismatched).isEmpty)
  }

  test("fuzz: random and bit-flipped blobs never throw") {
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 500) {
      val blob = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(blob)
      VideoCodec.decodeMp4(blob) // must not throw; result is irrelevant
    }
    val good = VideoCodec.encodeMp4(30000, 90000, 2, 1920, 1080)
    for (_ <- 1 to 500) {
      val mutated = good.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      VideoCodec.decodeMp4(mutated)
    }
  }

  test("version-1 mvhd (64-bit duration) parses") {
    // hand-build moov(mvhd v1): 8+8 timestamps, u32 timescale, u64 duration
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tp.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.putInt(0x01000000)            // version 1
      bb.position(20); bb.putInt(90000) // timescale after two u64 timestamps
      bb.putLong(0x100000000L)          // duration > 32 bits
      bb.array()
    }
    val trak = box("trak", box("tkhd", new Array[Byte](84)))
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val m = VideoCodec.decodeMp4(ftyp ++ box("moov", box("mvhd", mvhd.toArray) ++ trak)).get
    assert(m.timescale == 90000L && m.durationTicks == 0x100000000L)
    assert(m.width == 0 && m.height == 0)
  }

  test("encodeMp4 rejects invalid geometry") {
    intercept[IllegalArgumentException](VideoCodec.encodeMp4(0, 10, 1, 320, 240))
    intercept[IllegalArgumentException](VideoCodec.encodeMp4(1000, 10, 0, 320, 240))
    intercept[IllegalArgumentException](VideoCodec.encodeMp4(1000, 10, 1, 40000, 240))
  }
}
