package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {

  private def assets = {
    val rows = Seq(
      Row(1L, "image", "image/png", Array[Byte](1, 2, 3, 4), Row(8, 8, null, null)),
      Row(2L, "image", "image/png", Array[Byte](1, 2, 3, 4), Row(8, 8, null, null)), // dup payload
      Row(3L, "audio", "audio/wav", Array[Byte](9, 9, 9, 9, 9, 9), Row(null, null, 2000L, 16000)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.assetSchema)
  }

  test("payloadStats derives byte length and stable content key") {
    val s = Multimodal.payloadStats(assets).collect()
      .map(r => r.getAs[Long]("asset_id") -> (r.getAs[Long]("n_bytes"), r.getAs[String]("content_key"))).toMap
    assert(s(1L)._1 == 4 && s(3L)._1 == 6)
    assert(s(1L)._2 == s(2L)._2)
    assert(s(1L)._2 != s(3L)._2)
  }

  test("exactDedup keeps min-id asset per distinct payload") {
    val kept = Multimodal.exactDedup(assets).select("asset_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("decodeFeatures (raw-byte column path) yields normalized fixed-width vectors") {
    val f = Multimodal.decodeFeatures(assets, bins = 16).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        r.getAs[scala.collection.Seq[Double]]("features").toSeq).toMap
    assert(f.values.forall(_.size == 16))
    // identical payloads → identical features; deterministic across runs
    assert(f(1L) == f(2L))
    val sum = f(1L).sum
    assert(math.abs(sum - 1.0) < 1e-3) // L1-normalized
  }

  test("decodePartitions (mapPartitions codec shape) computes true byte histograms") {
    val out = Multimodal.decodePartitions(assets, bins = 8).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        r.getAs[scala.collection.Seq[Double]]("features").toSeq).toMap
    assert(out.values.forall(_.size == 8))
    assert(out(1L) == out(2L))            // identical payloads
    // asset 3 payload = six 0x09 bytes → all mass in bin 9 % 8 = 1
    assert(out(3L)(1) == 1.0)
    assert(out(3L).sum == 1.0)
    // schema evolution preserved the original columns
    val cols = Multimodal.decodePartitions(assets, 8).schema.fieldNames.toSeq
    assert(cols == Seq("asset_id", "modality", "mime_type", "payload", "meta", "decoded", "features"))
    // none of these synthetic payloads parse as an image
    assert(Multimodal.decodePartitions(assets, 8).collect()
      .forall(_.getAs[Row]("decoded") == null))
  }

  test("decodeFeatures (column path) ≡ decodePartitions (mapPartitions path)") {
    // the two decode paths must produce bit-identical features so either
    // can serve as the other's oracle at deployment
    for (bins <- Seq(8, 64)) {
      val colPath = Multimodal.decodeFeatures(assets, bins).collect()
        .map(r => r.getAs[Long]("asset_id") ->
          r.getAs[scala.collection.Seq[Double]]("features").toSeq).toMap
      val mpPath = Multimodal.decodePartitions(assets, bins).collect()
        .map(r => r.getAs[Long]("asset_id") ->
          r.getAs[scala.collection.Seq[Double]]("features").toSeq).toMap
      assert(colPath == mpPath, s"decode paths diverged at bins=$bins")
    }
    // true histogram semantics on a known payload: six 0x09 bytes, bins=8
    val f3 = Multimodal.decodeFeatures(assets, 8).collect()
      .find(_.getAs[Long]("asset_id") == 3L).get
      .getAs[scala.collection.Seq[Double]]("features")
    assert(f3(1) == 1.0 && f3.sum == 1.0)
  }

  // ---- real codec tier: PPM P6 + uncompressed BMP ----

  private val ppmPixels = Array.tabulate[Byte](12)(_.toByte) // 2x2 RGB
  private def ppmPayload: Array[Byte] =
    "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ ppmPixels

  private def le32(v: Int) = Array[Byte](
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  // 3x2 24-bpp bottom-up BMP: rows are 9 pixel bytes + 3 pad bytes
  private val bmpTopRow = Array.tabulate[Byte](9)(i => (10 + i).toByte)
  private val bmpBottomRow = Array.tabulate[Byte](9)(i => (20 + i).toByte)
  private def bmpPayload: Array[Byte] = {
    val pad = Array[Byte](0, 0, 0)
    val raster = (bmpBottomRow ++ pad) ++ (bmpTopRow ++ pad) // bottom-up storage
    ("BM".getBytes("US-ASCII") ++ le32(54 + raster.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(3) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(raster.length) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)) ++ raster
  }

  test("ImageCodec parses the PPM P6 header (comments included) and raster") {
    val img = ImageCodec.decode(ppmPayload).get
    assert(img.width == 2 && img.height == 2 && img.channels == 3)
    assert(img.pixels.sameElements(ppmPixels))
    // corrupt: truncated raster → no decode (never a partial image)
    assert(ImageCodec.decode(ppmPayload.dropRight(1)).isEmpty)
    assert(ImageCodec.decode("P6 2 2 70000 ".getBytes("US-ASCII")).isEmpty)
    // P5 grayscale: same header family, one sample per pixel
    val gray = Array[Byte](40, 41, 42, 43, 44, 45)
    val pgm = "P5\n3 2\n255\n".getBytes("US-ASCII") ++ gray
    val g = ImageCodec.decode(pgm).get
    assert(g.width == 3 && g.height == 2 && g.channels == 1)
    assert(g.pixels.sameElements(gray))
  }

  test("ImageCodec decodes bottom-up 24-bpp BMP, stripping row padding") {
    val img = ImageCodec.decode(bmpPayload).get
    assert(img.width == 3 && img.height == 2 && img.channels == 3)
    // emitted top-to-bottom despite bottom-up storage; pad bytes gone
    assert(img.pixels.sameElements(bmpTopRow ++ bmpBottomRow))
    // compressed (BI_RLE8=1) must be rejected, not mis-decoded
    val compressed = bmpPayload.clone(); compressed(30) = 1
    assert(ImageCodec.decode(compressed).isEmpty)
  }

  private def imageAssets = {
    val rows = Seq(
      Row(1L, "image", "image/x-portable-pixmap", ppmPayload, Row(null, null, null, null)),
      Row(2L, "image", "image/bmp", bmpPayload, Row(null, null, null, null)),
      Row(3L, "image", "application/octet-stream", Array[Byte](7, 7, 7, 7), Row(null, null, null, null)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Multimodal.assetSchema)
  }

  test("decodePartitions real codec: header dims + pixel-byte histogram ≡ ByteHistogram over the pixels") {
    val out = Multimodal.decodePartitions(imageAssets, bins = 8).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        (r.getAs[Row]("decoded"), r.getAs[scala.collection.Seq[Double]]("features").toSeq)).toMap
    assert(out(1L)._1 == Row(2, 2, 3))
    assert(out(2L)._1 == Row(3, 2, 3))
    assert(out(3L)._1 == null) // unparseable → no decode claim
    // oracle: the codegen'd ByteHistogram over a payload that IS the pixel
    // bytes must equal the decoded-pixel histogram exactly
    val pixelOracle = Seq(
      (1L, ppmPixels), (2L, bmpTopRow ++ bmpBottomRow),
      (3L, Array[Byte](7, 7, 7, 7))) // fallback tier: raw payload bytes
    val oracleDf = spark.createDataFrame(
      spark.sparkContext.parallelize(pixelOracle.map { case (id, px) =>
        Row(id, "image", "x", px, Row(null, null, null, null)) }),
      Multimodal.assetSchema)
    val expected = Multimodal.decodeFeatures(oracleDf, bins = 8).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        r.getAs[scala.collection.Seq[Double]]("features").toSeq).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(out(id)._2 == expected(id), s"pixel histogram diverged for asset $id")
  }

  test("ImageCodec rejects a BMP whose stored height is Int.MinValue") {
    // math.abs(Int.MinValue) is still negative: a corrupt/adversarial blob
    // must decode to None, never throw NegativeArraySizeException
    val corrupt = bmpPayload.clone()
    corrupt(22) = 0; corrupt(23) = 0; corrupt(24) = 0; corrupt(25) = 0x80.toByte
    assert(ImageCodec.decode(corrupt).isEmpty)
  }

  // ---- compressed raster tier: JPEG / PNG / GIF via JDK ImageIO ----

  private val pngW = 4; private val pngH = 3
  private val pngRgb: Array[Byte] = Array.tabulate[Byte](pngW * pngH * 3)(i => (i * 5 + 3).toByte)
  private def encode(format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      pngW, pngH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until pngH; x <- 0 until pngW) {
      val o = (y * pngW + x) * 3
      img.setRGB(x, y,
        ((pngRgb(o) & 0xff) << 16) | ((pngRgb(o + 1) & 0xff) << 8) | (pngRgb(o + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("ImageCodec decodes PNG losslessly through ImageIO") {
    val png = encode("png")
    assert(png(0) == 0x89.toByte && png(1) == 'P') // really a PNG container
    val img = ImageCodec.decode(png).get
    assert(img.width == pngW && img.height == pngH && img.channels == 3)
    assert(img.pixels.sameElements(pngRgb)) // PNG is lossless: exact round-trip
    // truncated stream → None, never a partial image or an exception
    assert(ImageCodec.decode(png.take(png.length / 2)).isEmpty)
  }

  test("ImageCodec decodes JPEG and GIF headers + rasters through ImageIO") {
    val jpg = encode("jpg")
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    val j = ImageCodec.decode(jpg).get
    // JPEG is lossy: dims and shape are exact, pixels only approximate
    assert(j.width == pngW && j.height == pngH && j.channels == 3)
    assert(j.pixels.length == pngW * pngH * 3)
    val gif = encode("gif")
    val g = ImageCodec.decode(gif).get
    assert(g.width == pngW && g.height == pngH && g.channels == 3)
    // deterministic: same payload decodes to the same bytes every time
    assert(ImageCodec.decode(jpg).get.pixels.sameElements(j.pixels))
  }

  test("decodePartitions routes compressed formats through the real codec") {
    val png = encode("png")
    val rows = Seq(
      Row(1L, "image", "image/png", png, Row(null, null, null, null)),
      Row(2L, "image", "application/octet-stream", Array[Byte](7, 7, 7, 7), Row(null, null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.assetSchema)
    val out = Multimodal.decodePartitions(df, bins = 8).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        (r.getAs[Row]("decoded"), r.getAs[scala.collection.Seq[Double]]("features").toSeq)).toMap
    assert(out(1L)._1 == Row(pngW, pngH, 3))
    assert(out(2L)._1 == null)
    // histogram oracle: ByteHistogram over the known PIXEL bytes must match
    val oracleDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "image", "x", pngRgb, Row(null, null, null, null)))),
      Multimodal.assetSchema)
    val expected = Multimodal.decodeFeatures(oracleDf, bins = 8).collect()
      .head.getAs[scala.collection.Seq[Double]]("features").toSeq
    assert(out(1L)._2 == expected)
  }

  test("ImageCodec fuzz: random and bit-flipped blobs never throw") {
    val rnd = new scala.util.Random(44)
    for (_ <- 1 to 500) {
      val blob = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(blob)
      ImageCodec.decode(blob) // must not throw; result is irrelevant
    }
    // mutate a valid P6 header+raster — magic bytes often survive, so
    // this walks the parser deeper than pure-random input does
    val ppm = ("P6\n4 3\n255\n").getBytes("US-ASCII") ++ Array.fill(36)(7.toByte)
    for (_ <- 1 to 500) {
      val mutated = ppm.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      ImageCodec.decode(mutated)
    }
  }

  test("sampleOffsets fans out k ordered offsets per asset") {
    val s = Multimodal.sampleOffsets(assets, k = 3)
      .collect().map(r => (r.getAs[Long]("asset_id"), r.getAs[Int]("sample_idx"), r.getAs[Long]("byte_offset")))
    assert(s.count(_._1 == 1L) == 3)
    val offsets3 = s.filter(_._1 == 3L).sortBy(_._2).map(_._3).toSeq
    assert(offsets3 == Seq(0L, 2L, 4L)) // 6 bytes / k=3
  }

  test("writePartitioned lays out modality= partitions for pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    Multimodal.writePartitioned(assets, dir)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("modality="))
    assert(dirs.toSet == Set("modality=image", "modality=audio"))
    val back = spark.read.parquet(dir)
    assert(back.filter(org.apache.spark.sql.functions.col("modality") === "audio").count() == 1)
  }

  test("decodeAudioPartitions parses WAV payloads, nulls everything else") {
    import org.apache.spark.sql.functions.col
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, AudioCodec.encodeWav(16000, 1, 16, 1600)),
        Row(2L, Array[Byte](9, 9, 9, 9)))),
      StructType(Seq(
        StructField("asset_id", LongType), StructField("payload", BinaryType))))
    val out = Multimodal.decodeAudioPartitions(df)
      .select(col("asset_id"), col("audio")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val a = out(1L).get
    assert((a.getInt(0), a.getInt(1), a.getInt(2), a.getLong(3), a.getLong(4)) ==
      ((16000, 1, 16, 1600L, 100L)))
    assert(out(2L).isEmpty)
  }

  test("audioPcm extracts the ramp PCM slice with sample-level clip stats") {
    import org.apache.spark.sql.functions.col
    // 8-bit mono: samples ARE the ramp bytes; seed 250 over 10 frames
    // covers 250..255,0..3 → rails hit at 255 and 0 → 2 clipped of 10
    val wav8 = AudioCodec.encodeWavRamp(8000, 1, 8, 10, seed = 250)
    // 16-bit mono: hi byte = lo + 1 mod 256 can never form ±full scale
    val wav16 = AudioCodec.encodeWavRamp(8000, 1, 16, 100, seed = 0)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, wav8), Row(2L, wav16), Row(3L, Array[Byte](1, 2, 3)))),
      StructType(Seq(
        StructField("asset_id", LongType), StructField("payload", BinaryType))))
    val out = Multimodal.audioPcm(df)
      .select(col("asset_id"), col("pcm"), col("n_samples"), col("n_clipped"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Array[Byte]]), Option(r.get(2)), Option(r.get(3)))).toMap
    val (pcm8, n8, c8) = out(1L)
    assert(pcm8.get.toSeq == (0 until 10).map(j => ((250 + j) & 0xff).toByte))
    assert(n8.contains(10L) && c8.contains(2L))
    val (pcm16, n16, c16) = out(2L)
    assert(pcm16.get.length == 200 && n16.contains(100L) && c16.contains(0L))
    assert(out(3L) == ((None, None, None))) // not a WAV → all-null, no throw
  }

  test("silenceStats counts window hits and the longest run; null pcm → zeros") {
    import org.apache.spark.sql.functions.col
    // hand-built byte rows: the silent window is [120, 136]
    val a = Array(100, 120, 125, 136, 50, 130, 10).map(_.toByte) // runs 3, 1
    val b = Array.tabulate(300)(i => ((100 + i) & 0xff).toByte) // one 17-run
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, a), Row(2L, b), Row(3L, null))),
      StructType(Seq(
        StructField("asset_id", LongType), StructField("pcm", BinaryType))))
    val out = Multimodal.silenceStats(df)
      .select(col("asset_id"), col("n_samples"), col("n_silent"), col("longest_run"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((7L, 4L, 3L)))
    // ramp 100..255,0..99,100..143: window [120,136] hit twice fully = 34 silent, run 17
    assert(out(2L) == ((300L, 34L, 17L)))
    assert(out(3L) == ((0L, 0L, 0L)))
  }

  test("clippedSamples counts signed 16-bit rails; dataChunk finds the slice") {
    // hand-built 16-bit payload: [32767, -32768, 0, 100] little-endian
    val wav = AudioCodec.encodeWav(8000, 1, 16, 4)
    val (off, len) = AudioCodec.dataChunk(wav).get
    assert(len == 8)
    val samples = Seq(32767, -32768, 0, 100)
    samples.zipWithIndex.foreach { case (s, i) =>
      wav(off + 2 * i) = (s & 0xff).toByte
      wav(off + 2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    assert(AudioCodec.clippedSamples(wav, off, len, 16) == 2L)
    // byte view of the same slice: FF,7F,00,80,00,00,64,00 → one 0xFF + four 0x00
    assert(AudioCodec.clippedSamples(wav, off, len, 8) == 5L)
  }

  test("encodeWav refuses payloads that overflow a 2 GiB buffer") {
    intercept[IllegalArgumentException](
      AudioCodec.encodeWav(48000, 8, 16, frames = 200 * 1000 * 1000))
  }

  test("decodeVideoPartitions parses MP4 payloads, nulls everything else") {
    import org.apache.spark.sql.functions.col
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, VideoCodec.encodeMp4(30000, 90000, 2, 1920, 1080)),
        Row(2L, Array[Byte](0, 0, 0, 0, 1, 2, 3, 4)))),
      StructType(Seq(
        StructField("asset_id", LongType), StructField("payload", BinaryType))))
    val out = Multimodal.decodeVideoPartitions(df)
      .select(col("asset_id"), col("video")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val v = out(1L).get
    assert((v.getLong(0), v.getLong(1), v.getInt(2), v.getInt(3), v.getInt(4), v.getLong(5)) ==
      ((30000L, 90000L, 2, 1920, 1080, 3000L)))
    assert(out(2L).isEmpty)
  }

  test("videoSampleRows fans out per-sample rows; undecodable payloads contribute none") {
    import org.apache.spark.sql.functions.col
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, VideoCodec.encodeMp4(600, 6000, 1, 320, 240, samples = Some((5, 10, 100)))),
        Row(2L, VideoCodec.encodeMp4(600, 6000, 1, 320, 240)), // metadata-only
        Row(3L, "not a movie".getBytes))),
      StructType(Seq(
        StructField("asset_id", LongType), StructField("payload", BinaryType))))
    val rows = Multimodal.videoSampleRows(df)
      .orderBy(col("asset_id"), col("sample_idx")).collect()
    assert(rows.forall(_.getLong(0) == 1L), "only the sampled asset yields rows")
    assert(rows.length == 5)
    assert(rows.map(_.getInt(2)).toSeq == (0 until 5))
    assert(rows.map(_.getLong(1)).distinct.toSeq == Seq(600L)) // movie timescale
    // offsets cumulative over sizes 10+(i%7)*17
    assert(rows.map(_.getLong(4)).toSeq == Seq(0L, 10L, 37L, 81L, 142L))
    // ticks: n1=2 at delta, rest at 2*delta
    assert(rows.map(_.getLong(5)).toSeq == Seq(0L, 100L, 200L, 400L, 600L))
  }

  test("VideoCodec walks stsz/stts sample tables into stream statistics") {
    // n=10, base=50, delta=100: sizes 50+(i%7)*17 → one full cycle (21*17)
    // plus 0+1+2 of the next; stts = 5×100 + 5×200
    val withSamples = VideoCodec.encodeMp4(600, 6000, 2, 640, 480,
      samples = Some((10, 50, 100)))
    val m = VideoCodec.decodeMp4(withSamples).get
    assert(m.nSamples == 10L)
    assert(m.sampleBytes == 10L * 50 + 17L * (21 + 3))
    assert(m.maxSampleSize == 50L + 6 * 17)
    assert(m.mediaTicks == 5L * 100 + 5L * 200)
    assert((m.timescale, m.nTracks, m.width) == ((600L, 2, 640))) // meta intact
    // metadata-only containers keep zero stats and still decode
    val bare = VideoCodec.decodeMp4(VideoCodec.encodeMp4(600, 6000, 1, 320, 240)).get
    assert((bare.nSamples, bare.sampleBytes, bare.maxSampleSize, bare.mediaTicks) ==
      ((0L, 0L, 0L, 0L)))
    // a truncated container is malformed, not a crash
    val cut = java.util.Arrays.copyOfRange(withSamples, 0, withSamples.length - 8)
    assert(VideoCodec.decodeMp4(cut).isEmpty)
    // stbl truncation specifically: shrink the declared stts entry count's
    // box end by rewriting the payload tail to fewer bytes than 2 entries
    // (flip the last stts byte off the end via a doctored copy)
    val doctored = withSamples.clone()
    // find the stts tag and corrupt its declared entry_count to 2^31
    val idx = doctored.sliding(4).indexWhere(w => new String(w.toArray, "US-ASCII") == "stts")
    val cntOff = idx + 8 // version/flags(4) then entry_count
    doctored(cntOff) = 0x7f.toByte
    assert(VideoCodec.decodeMp4(doctored).isEmpty)
    // hostile tick products: three stts entries of (2^31-1, 2^31-1) —
    // each term passes the per-field guard (and two terms still fit
    // int64), but the third wraps the running sum; must be malformed,
    // not garbage mediaTicks
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tp.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val stts3 = box("stts", {
      val bb = java.nio.ByteBuffer.allocate(8 + 24)
      bb.putInt(0).putInt(3)
      (1 to 3).foreach(_ => bb.putInt(Int.MaxValue).putInt(Int.MaxValue))
      bb.array()
    })
    val chain = box("mdia", box("minf", box("stbl", stts3)))
    assert(VideoCodec.parseSampleTables(chain, 0, chain.length.toLong).isEmpty)
    // two entries (just under the int64 line) still parse
    val stts2 = box("stts", {
      val bb = java.nio.ByteBuffer.allocate(8 + 16)
      bb.putInt(0).putInt(2)
      (1 to 2).foreach(_ => bb.putInt(Int.MaxValue).putInt(Int.MaxValue))
      bb.array()
    })
    val chain2 = box("mdia", box("minf", box("stbl", stts2)))
    assert(VideoCodec.parseSampleTables(chain2, 0, chain2.length.toLong)
      .exists(_._4 == 2L * Int.MaxValue * Int.MaxValue))
    // a malformed mdia CHILD (declared size overrunning its parent) must
    // poison the decode, not read as a clean zero-stat container
    val badChild = withSamples.clone()
    val mdiaIdx = badChild.sliding(4).indexWhere(w => new String(w.toArray, "US-ASCII") == "mdia")
    badChild(mdiaIdx - 4) = 0x7f.toByte // size field precedes the tag
    assert(VideoCodec.decodeMp4(badChild).isEmpty)
  }

  test("encodePng emits the closed-form pattern and survives the full decode chain") {
    // decoded byte j must be (j + seed) % 256 — the arithmetic the
    // mm_image_features oracle predicts
    for ((w, h, seed) <- Seq((8, 8, 0), (11, 9, 37), (15, 15, 255))) {
      val img = ImageCodec.decode(ImageCodec.encodePng(w, h, seed)).get
      assert(img.width == w && img.height == h && img.channels == 3)
      val bad = img.pixels.zipWithIndex.filterNot { case (b, j) =>
        (b & 0xff) == (j + seed) % 256
      }
      assert(bad.isEmpty, s"${bad.length} pattern mismatches at ${w}x$h seed=$seed")
    }
  }

  test("synthesizePngPayload + decodePartitions: corrupt payloads degrade, never throw") {
    import spark.implicits._
    val geo = Seq((1L, 8, 8, 5), (2L, 9, 10, 200)).toDF(
      "asset_id", "width", "height", "pattern_seed")
    val good = Multimodal.synthesizePngPayload(geo).select("asset_id", "payload")
    // corrupt tier: a truncated PNG (valid magic, torn stream) and junk
    val corrupt = Seq(
      (3L, ImageCodec.encodePng(8, 8, 1).take(20)),
      (4L, Array[Byte](0x42, 0x41, 0x44))).toDF("asset_id", "payload")
    val out = Multimodal.decodePartitions(good.unionByName(corrupt), bins = 16)
      .selectExpr("asset_id", "decoded IS NOT NULL AS ok")
      .as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
  }

  test("thumbprint8 is scale-invariant on block patterns and injective across seeds") {
    // same seed at 1×/2×/4× resolution → identical fingerprint bytes
    val prints = Seq(1, 2, 4).map { m =>
      val img = ImageCodec.decode(ImageCodec.encodeBlockPng(m, seed = 7)).get
      ImageCodec.thumbprint8(img).toSeq
    }
    assert(prints.distinct.size == 1)
    // every seed pair differs (13 invertible mod 256 — all 64 cells shift)
    val bySeed = (0 until 32).map { s =>
      ImageCodec.thumbprint8(ImageCodec.decode(ImageCodec.encodeBlockPng(1, s)).get).toSeq
    }
    assert(bySeed.distinct.size == 32)
  }

  test("thumbprintPartitions: scaled dups share a thumb, corrupt payloads get null") {
    import spark.implicits._
    val assets = Seq((1L, 1, 5), (2L, 3, 5), (3L, 2, 9)).toDF(
      "asset_id", "size_mult", "seed")
    val good = Multimodal.synthesizeBlockPngPayload(assets)
      .select("asset_id", "payload")
    val corrupt = Seq((4L, Array[Byte](1, 2, 3))).toDF("asset_id", "payload")
    val out = Multimodal.thumbprintPartitions(good.unionByName(corrupt))
      .select("asset_id", "thumb").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).isDefined && out(1L) == out(2L)) // seed 5 at 8px and 24px
    assert(out(3L).isDefined && out(3L) != out(1L))
    assert(out(4L).isEmpty)
  }

  test("encodeJpegBlock fuzz: real lossy round-trip holds dims exactly and mean within tolerance; truncation never throws") {
    val rnd = new scala.util.Random(20260814L)
    (0 until 60).foreach { _ =>
      val m = 1 + rnd.nextInt(8)       // cells of m×m px, image 8m × 8m
      val seed = rnd.nextInt(256)
      val q = 0.5f + rnd.nextFloat() * 0.45f
      val bytes = ImageCodec.encodeJpegBlock(m, seed, q)
      val img = ImageCodec.decode(bytes).get
      assert(img.width == 8 * m && img.height == 8 * m && img.channels == 3)
      val mean = img.pixels.iterator.map(_ & 0xff).map(_.toLong).sum.toDouble /
        img.pixels.length
      val expMean = (0 until 64).map(i =>
        ((i % 8) * 7 + (i / 8) * 11 + seed * 13) % 256).sum / 64.0
      // misaligned cells (m != 8) put edges inside DCT blocks — allow a
      // wider band there; the 8-aligned fixture regime must stay tight
      val tol = if (m == 8) 3.0 else 8.0
      assert(math.abs(mean - expMean) <= tol,
        s"m=$m seed=$seed q=$q mean=$mean exp=$expMean")
      // every truncation of a real JPEG stream must decode to None (or a
      // full parse), never throw — the corrupt-never-throw seam
      Seq(2, 4, bytes.length / 4, bytes.length / 2, bytes.length - 1).foreach { cut =>
        ImageCodec.decode(java.util.Arrays.copyOf(bytes, cut)) // must not throw
      }
    }
  }

  test("decodeStatsPartitions: exact pixel moments for decodable payloads, zero moments for corrupt") {
    import spark.implicits._
    val assets = Seq((1L, 8, 5), (2L, 8, 77)).toDF("asset_id", "size_mult", "seed")
    val good = Multimodal.synthesizeBlockJpegPayload(assets)
      .select("asset_id", "payload")
    val corrupt = Seq((3L, Array[Byte](9, 9, 9))).toDF("asset_id", "payload")
    val out = Multimodal.decodeStatsPartitions(good.unionByName(corrupt))
      .selectExpr("asset_id", "decoded.width", "px_sum", "px_n").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._1.contains(64) && out(1L)._3 == 64L * 64 * 3)
    // moments must equal a direct local decode of the same payload
    val local = ImageCodec.decode(ImageCodec.encodeJpegBlock(8, 5)).get
    assert(out(1L)._2 == local.pixels.iterator.map(_ & 0xff).map(_.toLong).sum)
    assert(out(2L)._2 != out(1L)._2) // distinct seeds → distinct sums
    assert(out(3L) == (None, 0L, 0L))
  }

  test("fromBinaryFiles wraps binaryFile-shaped input into the asset schema") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("/data/a.png", Array[Byte](1, 2)))),
      StructType(Seq(StructField("path", StringType), StructField("content", BinaryType))))
    val out = Multimodal.fromBinaryFiles(raw, "image")
    assert(out.schema.fieldNames.toSeq ==
      Seq("asset_id", "modality", "mime_type", "payload", "meta"))
    assert(out.collect().head.getAs[String]("modality") == "image")
  }
}
