package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real PNG codec backed by the JDK's built-in `javax.imageio` PNG
  * reader/writer — no dependency beyond the JRE, so decode runs on any
  * executor. PNG is the format a real 100 TB multimodal corpus actually
  * ships in (BMP proved the plumbing; PNG makes it a production format).
  *
  * PNG truecolor is LOSSLESS: `decode(encode(f)) ≡ f` bit-exactly for any
  * 8-bit-per-channel pixel function, which is what lets the m03/m04
  * analytic-pixel oracle technique apply unchanged to PNG fixtures (m05).
  * Output is normalized to the same [[BmpCodec.DecodedImage]] shape (RGB
  * interleaved, row-major, top-down) so every downstream consumer
  * ([[graft.functions.DHashExpr]], [[Multimodal.imageFeatures]]) is
  * format-agnostic via [[ImageCodec]].
  */
object PngCodec {

  // ImageIO defaults to a disk-backed stream cache; executors decode from
  // in-memory byte arrays, so the temp-file cache is pure overhead.
  ImageIO.setUseCache(false)

  /** 8-byte PNG signature: 0x89 'P' 'N' 'G' \r \n 0x1a \n. */
  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G' && bytes(4) == 0x0d && bytes(5) == 0x0a &&
      (bytes(6) & 0xff) == 0x1a && bytes(7) == 0x0a

  /** Encode an 8-bit truecolor PNG from an (x, y) → (r, g, b) pixel function
    * with y = 0 the top row — the fixture producer for m05. */
  def encode(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", out), "JDK PNG writer unavailable")
    out.toByteArray
  }

  /** Decode a PNG to top-down interleaved RGB. Throws on non-PNG input or a
    * failed parse — loud beats a silently garbled image. */
  def decode(bytes: Array[Byte]): BmpCodec.DecodedImage = {
    require(isPng(bytes), "not a PNG: missing signature")
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "PNG parse failed")
    val w = img.getWidth; val h = img.getHeight
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val p = argb(i)
      out(i * 3) = ((p >> 16) & 0xff).toByte
      out(i * 3 + 1) = ((p >> 8) & 0xff).toByte
      out(i * 3 + 2) = (p & 0xff).toByte
      i += 1
    }
    BmpCodec.DecodedImage(w, h, out)
  }
}

/** Format-sniffing image decode dispatch: routes on magic bytes so every
  * image consumer (dHash, feature extraction) is format-agnostic. Adding a
  * format = one codec object + one magic branch here. */
object ImageCodec {
  def decode(bytes: Array[Byte]): BmpCodec.DecodedImage = {
    require(bytes.length >= 2, s"image too short: ${bytes.length} bytes")
    if (PngCodec.isPng(bytes)) PngCodec.decode(bytes)
    else if (JpegCodec.isJpeg(bytes)) JpegCodec.decode(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') BmpCodec.decode(bytes)
    else throw new IllegalArgumentException(
      f"unrecognized image magic 0x${bytes(0) & 0xff}%02x${bytes(1) & 0xff}%02x (supported: BMP, PNG, JPEG)")
  }
}
