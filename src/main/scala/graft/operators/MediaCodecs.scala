package graft.operators

/** Decoded raster image: `pixels` is row-major TOP-DOWN, `channels`
  * bytes per pixel in storage order (BGR for BMP). Length is exactly
  * width * height * channels — padding stripped by the decoder.
  */
final case class DecodedImage(
    width: Int, height: Int, channels: Int, pixels: Array[Byte])

/** A pure-JVM media codec. `decode` returns None when the payload is not
  * a (supported) instance of the format — the caller falls back to the
  * byte-level stand-in, so an unreadable payload degrades rather than
  * fails the pipeline.
  */
trait MediaCodec extends Serializable {
  def decode(payload: Array[Byte]): Option[DecodedImage]
}

/** Windows BMP, the uncompressed 24-bit BI_RGB profile — decodable with
  * zero native dependencies (the r8 verdict's "partially fixable
  * offline" codec). Layout (all integers little-endian):
  *
  *   bytes 0-1   "BM"
  *   bytes 10-13 offset of the pixel array (offBits)
  *   bytes 14-17 DIB header size (>= 40, BITMAPINFOHEADER or later)
  *   bytes 18-21 width (signed; must be > 0)
  *   bytes 22-25 height (signed; > 0 = rows stored BOTTOM-UP,
  *               < 0 = top-down)
  *   bytes 28-29 bits per pixel (24 here)
  *   bytes 30-33 compression (0 = BI_RGB)
  *
  * Rows are padded to 4-byte boundaries; pixels are BGR. The decoder
  * returns rows TOP-DOWN with padding stripped, whichever orientation
  * the file used.
  */
object BmpCodec extends MediaCodec {

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def decode(payload: Array[Byte]): Option[DecodedImage] = {
    val b = payload
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val offBits = le32(b, 10)
    val dibSize = le32(b, 14)
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    // rawHeight == Int.MinValue survives math.abs as negative, and a
    // width near 2^30 overflows `width * 3` — both must reject here, in
    // LONG arithmetic, or a crafted header throws instead of degrading
    // to None (r9 advice)
    if (dibSize < 40 || width <= 0 || rawHeight == 0 ||
        rawHeight == Int.MinValue || bpp != 24 || compression != 0) return None
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val rowBytesL = 3L * width
    val strideL = (rowBytesL + 3L) & ~3L
    if (offBits < 0 || rowBytesL > Int.MaxValue ||
        height.toLong * strideL + offBits > b.length) return None
    // both fit Int now: height*stride + offBits <= b.length <= 2^31-1
    val rowBytes = rowBytesL.toInt
    val stride = strideL.toInt
    val out = new Array[Byte](rowBytes * height)
    var r = 0
    while (r < height) {
      val srcRow = if (bottomUp) height - 1 - r else r
      System.arraycopy(b, offBits + srcRow * stride, out, r * rowBytes, rowBytes)
      r += 1
    }
    Some(DecodedImage(width, height, 3, out))
  }

  /** Encode top-down BGR pixel rows as a bottom-up 24-bit BI_RGB BMP —
    * the inverse of [[decode]]; used by the q191 round-trip query and
    * the codec spec's fixtures.
    */
  def encode(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length >= width * height * 3,
      s"need ${width * height * 3} pixel bytes, got ${pixels.length}")
    val rowBytes = width * 3
    val stride = (rowBytes + 3) & ~3
    val dataSize = stride * height
    val fileSize = 54 + dataSize
    val b = new Array[Byte](fileSize)
    def w32(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    def w16(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    w32(2, fileSize); w32(10, 54)
    w32(14, 40); w32(18, width); w32(22, height) // positive = bottom-up
    w16(26, 1); w16(28, 24); w32(30, 0); w32(34, dataSize)
    var r = 0
    while (r < height) {
      // top-down source row r lands at bottom-up file row (height-1-r)
      System.arraycopy(pixels, r * rowBytes,
        b, 54 + (height - 1 - r) * stride, rowBytes)
      r += 1
    }
    b
  }
}

/** mime → codec registry. Formats without a pure-JVM decoder in this
  * container (JPEG/PNG/audio/video) are absent and take the byte-level
  * stand-in path in [[Multimodal.decodeAndExtract]].
  */
object MediaCodecs {
  val registry: Map[String, MediaCodec] = Map("image/bmp" -> BmpCodec)
}
