package graft.operators

/** Real in-JVM image codec for 24-bit uncompressed BMP (BITMAPINFOHEADER,
  * BI_RGB) — the multimodal decode stage, no longer a stub for this format.
  * BMP is self-contained byte math (fixed little-endian header offsets,
  * 4-byte-padded BGR rows, bottom-up row order), so decode runs on executors
  * with zero native dependencies, and every step is mirrorable in SQL for
  * the m03 oracle.
  *
  * Format per the public Windows BITMAPFILEHEADER/BITMAPINFOHEADER layout:
  * bytes 0-1 "BM", 2-5 file size, 10-13 pixel-array offset, 14-17 DIB header
  * size, 18-21 width (signed), 22-25 height (signed; positive = bottom-up),
  * 26-27 planes, 28-29 bits-per-pixel, 30-33 compression (0 = BI_RGB). Pixel
  * rows are 3·width bytes of B,G,R padded to a multiple of 4.
  */
object BmpCodec {

  /** Decoded image: RGB interleaved, row-major, TOP-DOWN (row 0 = top) —
    * normalized from BMP's bottom-up storage. */
  final case class DecodedImage(width: Int, height: Int, pixels: Array[Byte])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  private def rowStride(width: Int): Int = (3 * width + 3) & ~3

  /** Decode a 24-bit BI_RGB BMP. Supports both bottom-up (height > 0) and
    * top-down (height < 0) pixel order; throws on anything that isn't an
    * uncompressed 24-bit BMP — loud beats a silently garbled image. */
  def decode(bytes: Array[Byte]): DecodedImage = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length} bytes")
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP: missing BM magic")
    val pixelOffset = le32(bytes, 10)
    val width = le32(bytes, 18)
    val rawHeight = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(bpp == 24, s"unsupported bpp $bpp (only 24-bit)")
    require(compression == 0, s"unsupported compression $compression (only BI_RGB)")
    require(width > 0, s"bad width $width")
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val stride = rowStride(width)
    require(bytes.length >= pixelOffset + stride * height,
      s"truncated pixel array: need ${pixelOffset + stride * height}, have ${bytes.length}")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = pixelOffset + stride * (if (bottomUp) height - 1 - y else y)
      var x = 0
      while (x < width) {
        val s = srcRow + 3 * x
        val d = (y * width + x) * 3
        out(d) = bytes(s + 2)     // R  (stored B,G,R)
        out(d + 1) = bytes(s + 1) // G
        out(d + 2) = bytes(s)     // B
        x += 1
      }
      y += 1
    }
    DecodedImage(width, height, out)
  }

  /** Encode a 24-bit bottom-up BI_RGB BMP from an (x, y) → (r, g, b) pixel
    * function with y = 0 the TOP row — a valid file any viewer opens; the
    * fixture producer for m03 and MultimodalSpec round trips. */
  def encode(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = rowStride(width)
    val fileSize = 54 + stride * height
    val b = new Array[Byte](fileSize)
    def putLe32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    putLe32(2, fileSize)
    putLe32(10, 54)        // pixel-array offset
    putLe32(14, 40)        // BITMAPINFOHEADER size
    putLe32(18, width)
    putLe32(22, height)    // positive: bottom-up
    b(26) = 1              // planes
    b(28) = 24             // bpp
    putLe32(30, 0)         // BI_RGB
    putLe32(34, stride * height)
    putLe32(38, 2835); putLe32(42, 2835) // 72 dpi
    var y = 0
    while (y < height) {
      val dstRow = 54 + stride * (height - 1 - y) // bottom-up storage
      var x = 0
      while (x < width) {
        val (r, g, bl) = rgb(x, y)
        val d = dstRow + 3 * x
        b(d) = bl.toByte; b(d + 1) = g.toByte; b(d + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    b
  }
}
