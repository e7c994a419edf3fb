package graft.multimodal

/** Pure-JVM decoders for two trivially-parseable raster formats — the REAL
  * codec step of the multimodal pipeline (no native libraries required):
  *
  *  - Netpbm binary: PPM "P6" (RGB) and PGM "P5" (grayscale) — ASCII
  *    header `P6|P5 <w> <h> <maxval>` (whitespace-separated, `#` comments
  *    allowed) followed by a single whitespace byte and `w*h*channels`
  *    raw sample bytes (maxval < 256).
  *  - BMP (Windows BITMAPINFOHEADER, uncompressed BI_RGB, 24 or 32 bpp):
  *    fixed little-endian header offsets; rows padded to 4 bytes and
  *    stored bottom-up unless height is negative.
  *
  * Compressed raster formats (JPEG, PNG, GIF) decode through the JDK's
  * `javax.imageio` — still zero native dependencies. Their byte streams
  * are sniffed by magic number (FF D8 FF / ‰PNG / GIF8) and routed to an
  * [[decodeImageIO]] path that checks header dimensions against
  * [[MaxPixelBytes]] BEFORE paying for the full pixel decode, then
  * flattens to the same interleaved layout (alpha dropped, grayscale kept
  * 1-channel).
  *
  * All paths decode to (width, height, channels, pixels) with pixels in
  * top-to-bottom row order and row padding stripped — so downstream
  * feature extraction sees exactly the image's sample bytes, nothing
  * else. Formats that don't parse return None; the caller decides the
  * fallback (graft keeps the raw-byte feature path for those).
  *
  * Audio/video containers plug in at the same seam with a native library;
  * the per-partition init/decode shape in [[Multimodal.decodePartitions]]
  * does not change.
  */
object ImageCodec {

  // ImageIO's convenience entry points default to FILE-backed stream
  // caching: every encode/decode of an in-memory byte array would create
  // (and fsync-churn) a temp file on executor-local disk — measured ~2×
  // on the PNG round-trip queries. Rather than flipping the JVM-GLOBAL
  // `ImageIO.setUseCache(false)` (which would change stream-caching
  // behavior for every other ImageIO user sharing the executor JVM),
  // every call site below builds an explicit in-memory stream, so the
  // codec is fast without mutating global state.
  private def memOut(out: java.io.OutputStream) =
    new javax.imageio.stream.MemoryCacheImageOutputStream(out)
  private def memIn(b: Array[Byte]) =
    new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(b))

  /** Decoded raster: `pixels.length == width * height * channels`. */
  final case class DecodedImage(
      width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Decode bound: reject parsed dimensions whose pixel buffer would
    * exceed this many bytes (corrupt headers must not OOM an executor). */
  val MaxPixelBytes: Int = 1 << 28 // 256 MB

  def decode(payload: Array[Byte]): Option[DecodedImage] =
    if (payload == null || payload.length < 4) None
    else if (payload(0) == 'P' && payload(1) == '6') decodeNetpbm(payload, channels = 3)
    else if (payload(0) == 'P' && payload(1) == '5') decodeNetpbm(payload, channels = 1)
    else if (payload(0) == 'B' && payload(1) == 'M') decodeBmp(payload)
    else if (isJpeg(payload) || isPng(payload) || isGif(payload)) decodeImageIO(payload)
    else None

  private def isJpeg(b: Array[Byte]): Boolean =
    (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff
  private def isPng(b: Array[Byte]): Boolean =
    (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isGif(b: Array[Byte]): Boolean =
    b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  // ----------------------------------------- Netpbm binary (P6 RGB, P5 gray)

  private def decodeNetpbm(b: Array[Byte], channels: Int): Option[DecodedImage] = {
    var pos = 2 // past "P6"
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    // skip whitespace and '#'-to-EOL comments
    def skipSeparators(): Boolean = {
      var progressed = false
      var more = true
      while (more && pos < b.length) {
        if (isWs(b(pos))) { pos += 1; progressed = true }
        else if (b(pos) == '#') {
          while (pos < b.length && b(pos) != '\n') pos += 1
          progressed = true
        } else more = false
      }
      progressed
    }
    def readInt(): Int = {
      if (!skipSeparators()) return -1
      var v = 0L
      var digits = 0
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); digits += 1; pos += 1
        if (v > Int.MaxValue) return -1
      }
      if (digits == 0) -1 else v.toInt
    }
    val w = readInt(); val h = readInt(); val maxVal = readInt()
    if (w <= 0 || h <= 0 || maxVal <= 0 || maxVal > 255) return None
    // exactly ONE whitespace byte separates the header from the raster
    if (pos >= b.length || !isWs(b(pos))) return None
    pos += 1
    val nPix = w.toLong * h * channels
    if (nPix > MaxPixelBytes || b.length - pos < nPix) return None
    Some(DecodedImage(w, h, channels,
      java.util.Arrays.copyOfRange(b, pos, pos + nPix.toInt)))
  }

  // ------------------------------------------------------------------- BMP

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def decodeBmp(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 54) return None // file header (14) + BITMAPINFOHEADER (40)
    val dataOffset = i32(b, 10)
    val dibSize = i32(b, 14)
    val width = i32(b, 18)
    val rawHeight = i32(b, 22)
    val planes = u16(b, 26)
    val bpp = u16(b, 28)
    val compression = i32(b, 30)
    if (dibSize < 40 || planes != 1 || compression != 0) return None
    if (bpp != 24 && bpp != 32) return None
    val topDown = rawHeight < 0
    // Int.MinValue survives math.abs still negative — reject it explicitly,
    // or the negative value sails through every bound below and blows up in
    // the array allocation on a corrupt/adversarial blob
    if (width <= 0 || rawHeight == Int.MinValue) return None
    val height = math.abs(rawHeight)
    if (height == 0) return None
    val channels = bpp / 8
    val rowBytes = width.toLong * channels
    val rowStride = (rowBytes + 3) / 4 * 4 // rows pad to 4-byte boundaries
    val nPix = rowBytes * height
    if (nPix > MaxPixelBytes) return None
    if (dataOffset < 0 || dataOffset.toLong + rowStride * height > b.length) return None
    val out = new Array[Byte](nPix.toInt)
    var row = 0
    while (row < height) {
      // stored bottom-up unless height was negative; emit top-to-bottom
      val srcRow = if (topDown) row else height - 1 - row
      System.arraycopy(b, dataOffset + (srcRow * rowStride).toInt,
        out, (row * rowBytes).toInt, rowBytes.toInt)
      row += 1
    }
    Some(DecodedImage(width, height, channels, out))
  }

  // -------------------------------------------------- synthesis (round-trip)

  /** Synthesis side of the image round-trip (the [[AudioCodec.encodeWavRamp]]
    * analog): a REAL PNG (ImageIO encoder, zlib-compressed, lossless) whose
    * RGB pixel bytes follow a closed-form pattern — byte at interleaved-RGB
    * linear index `j` is `(j + seed) mod 256` — so after the full
    * encode → container sniff → ImageIO decode → RGB flatten chain, the
    * pixel byte histogram is predictable arithmetically by a SQL oracle.
    * Lossless means decode must return EXACTLY these values; any codec or
    * flattening bug anywhere in the chain breaks the prediction. */
  def encodePng(width: Int, height: Int, seed: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && width.toLong * height * 3 <= MaxPixelBytes,
      s"bad PNG geometry ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val j = (y * width + x) * 3
        val r = (j + seed) & 0xff
        val g = (j + 1 + seed) & 0xff
        val b = (j + 2 + seed) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = memOut(out)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    out.toByteArray
  }

  /** Block-pattern PNG for the perceptual-hash round-trip: an
    * `8·sizeMult` pixel square whose value is CONSTANT per cell of the
    * 8×8 grid — `v = (bx·7 + by·11 + seed·13) & 0xff` on all three
    * channels — so every `sizeMult` renders the SAME normalized image at
    * a different resolution. Distinct seeds differ in every cell (13 is
    * invertible mod 256), which is what makes seed-groups the closed-form
    * oracle for [[thumbprint8]] dedup. */
  def encodeBlockPng(sizeMult: Int, seed: Int): Array[Byte] = {
    val img = blockImage(sizeMult, seed)
    val out = new java.io.ByteArrayOutputStream()
    val ios = memOut(out)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    out.toByteArray
  }

  private def blockImage(sizeMult: Int, seed: Int): java.awt.image.BufferedImage = {
    require(sizeMult >= 1 && sizeMult <= 64, s"bad sizeMult $sizeMult")
    val w = 8 * sizeMult
    val img = new java.awt.image.BufferedImage(
      w, w, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < w) {
      var x = 0
      while (x < w) {
        val v = ((x / sizeMult) * 7 + (y / sizeMult) * 11 + seed * 13) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** The LOSSY sibling of [[encodeBlockPng]]: the same block pattern as a
    * real JPEG (ImageIO's writer at an explicit `quality`). With
    * `sizeMult = 8` every constant 8×8 cell aligns exactly with one DCT
    * block, so the encoded stream carries only (quantized) DC terms and
    * the decode returns the pattern to within a few luma levels — which
    * is what makes a TOLERANCE-gated fidelity oracle possible for a
    * format whose bytes are not closed-form: dims are exact, the mean
    * pixel value must sit within the DC-quantization error of the
    * pattern's arithmetic mean. */
  def encodeJpegBlock(sizeMult: Int, seed: Int, quality: Float = 0.9f): Array[Byte] = {
    val img = blockImage(sizeMult, seed)
    val out = new java.io.ByteArrayOutputStream()
    val ios = memOut(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Scale-invariant perceptual fingerprint: mean-pool the decoded image
    * onto an 8×8 luma grid (the normalization step of aHash/dHash-family
    * perceptual hashing) and return the 64 pooled bytes. Pixel (x, y)
    * maps to cell (x·8 div w, y·8 div h); the cell value is the floor
    * mean over every channel sample that lands in it — exact integer
    * arithmetic, so for block-aligned inputs ([[encodeBlockPng]]) the
    * thumbprint equals the block values at ANY resolution: rescaled
    * duplicates collide while every distinct pattern differs. Real use:
    * group by (a hash of) this fingerprint to catch re-encoded/resized
    * image duplicates that exact payload hashing misses. */
  def thumbprint8(img: DecodedImage): Array[Byte] = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    val w = img.width; val h = img.height; val ch = img.channels
    var y = 0
    while (y < h) {
      val cy = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val cell = cy * 8 + (x.toLong * 8 / w).toInt
        val base = (y * w + x) * ch
        var c = 0
        while (c < ch) { sums(cell) += img.pixels(base + c) & 0xff; c += 1 }
        counts(cell) += ch
        x += 1
      }
      y += 1
    }
    val out = new Array[Byte](64)
    var i = 0
    while (i < 64) {
      out(i) = (if (counts(i) == 0) 0 else sums(i) / counts(i)).toByte
      i += 1
    }
    out
  }

  // ------------------------------------------- JPEG / PNG / GIF via ImageIO

  /** Decode a compressed raster through `javax.imageio` (pure JVM).
    * Header dimensions are read from the format reader BEFORE the pixel
    * decode and checked against [[MaxPixelBytes]], so a corrupt or
    * adversarial header cannot OOM the executor. Pixels flatten to the
    * Netpbm layout: interleaved RGB top-to-bottom (alpha dropped), or
    * 1-channel for grayscale color models. Any reader exception — truncated
    * stream, bad Huffman tables, unsupported subformat — returns None. */
  private def decodeImageIO(b: Array[Byte]): Option[DecodedImage] =
    try {
      val iis = memIn(b)
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          // dims come from the header only — no pixel decode yet
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h * 3 > MaxPixelBytes) return None
          val img = reader.read(0)
          val gray = img.getColorModel.getNumColorComponents == 1
          val channels = if (gray) 1 else 3
          val out = new Array[Byte](w * h * channels)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val argb = row(x)
              val o = (y * w + x) * channels
              if (gray) out(o) = (argb & 0xff).toByte // r==g==b for gray models
              else {
                out(o) = ((argb >> 16) & 0xff).toByte
                out(o + 1) = ((argb >> 8) & 0xff).toByte
                out(o + 2) = (argb & 0xff).toByte
              }
              x += 1
            }
            y += 1
          }
          Some(DecodedImage(w, h, channels, out))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
}
