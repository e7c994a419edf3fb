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
  * Both decode to (width, height, channels, pixels) with pixels in
  * top-to-bottom row order and row padding stripped — so downstream
  * feature extraction sees exactly the image's sample bytes, nothing
  * else. Formats that don't parse return None; the caller decides the
  * fallback (graft keeps the raw-byte feature path for those).
  *
  * Heavier formats (JPEG/PNG/audio/video) plug in at the same seam with a
  * native library; the per-partition init/decode shape in
  * [[Multimodal.decodePartitions]] does not change.
  */
object ImageCodec {

  /** Decoded raster: `pixels.length == width * height * channels`. */
  final case class DecodedImage(
      width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Decode bound: reject parsed dimensions whose pixel buffer would
    * exceed this many bytes (corrupt headers must not OOM an executor). */
  val MaxPixelBytes: Int = 1 << 28 // 256 MB

  def decode(payload: Array[Byte]): Option[DecodedImage] =
    if (payload == null || payload.length < 2) None
    else if (payload(0) == 'P' && payload(1) == '6') decodeNetpbm(payload, channels = 3)
    else if (payload(0) == 'P' && payload(1) == '5') decodeNetpbm(payload, channels = 1)
    else if (payload(0) == 'B' && payload(1) == 'M') decodeBmp(payload)
    else None

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
    val height = math.abs(rawHeight)
    if (width <= 0 || height == 0) return None
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
}
