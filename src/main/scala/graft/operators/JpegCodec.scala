package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Real JPEG codec backed by the JDK's built-in `javax.imageio` JPEG
  * reader/writer — the format a real 100 TB image corpus actually ships in
  * (PNG/BMP proved the lossless plumbing; JPEG is the lossy production
  * format). Decode normalizes to [[BmpCodec.DecodedImage]] so every image
  * consumer ([[graft.functions.DHashExpr]], [[Multimodal]]) works unchanged
  * through the [[ImageCodec]] magic dispatch.
  *
  * ==Why there is no m-row oracle for JPEG (spec-verified instead)==
  * JPEG decode is LOSSY and spec'd only up to IDCT rounding: decoded pixels
  * are deterministic for a fixed decoder (same bytes → same pixels on this
  * JDK, pinned by ImageHashSpec) but not analytically reproducible in SQL
  * the way BMP/PNG pixels are, so the m03/m04 analytic-pixel oracle
  * technique cannot apply. The verified contract is therefore behavioral —
  * in-container decode determinism, dHash stability under quality-90
  * re-encode, and cross-format near-dup survival — the same
  * spec-instead-of-oracle precedent as the S3 Kafka surface and K3 archiver
  * (VERDICT r6 "correctness = spec" rows).
  */
object JpegCodec {

  ImageIO.setUseCache(false) // decode from in-memory arrays, no temp files

  /** 3-byte SOI + marker prefix 0xFF 0xD8 0xFF — covers JFIF (FFD8FFE0),
    * EXIF (FFD8FFE1), and bare-SOI streams. */
  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff

  /** Encode an 8-bit YCbCr JPEG at `quality` (0..1, default 0.9) from an
    * (x, y) → (r, g, b) pixel function with y = 0 the top row. The JDK
    * writer emits a JFIF container (FFD8FFE0). */
  def encode(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int),
             quality: Float = 0.9f): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(quality > 0f && quality <= 1f, s"bad quality $quality")
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
    val writers = ImageIO.getImageWritersByFormatName("jpg")
    require(writers.hasNext, "JDK JPEG writer unavailable")
    val writer = writers.next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Re-encode already-decoded pixels (e.g. a BMP fixture) as JPEG — the
    * "same image, lossy rendition" producer for the near-dup specs. */
  def reencode(img: BmpCodec.DecodedImage, quality: Float = 0.9f): Array[Byte] =
    encode(img.width, img.height, (x, y) => {
      val o = (y * img.width + x) * 3
      (img.pixels(o) & 0xff, img.pixels(o + 1) & 0xff, img.pixels(o + 2) & 0xff)
    }, quality)

  /** Decode a JPEG to top-down interleaved RGB. Deterministic for a fixed
    * decoder (see scaladoc); throws on non-JPEG input or a failed parse. */
  def decode(bytes: Array[Byte]): BmpCodec.DecodedImage = {
    require(isJpeg(bytes), "not a JPEG: missing SOI marker")
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "JPEG parse failed")
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
