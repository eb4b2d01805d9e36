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

  // ==Chunk-level surgery (PII scrubbing for image metadata)==
  // PNG after the 8-byte signature is a chunk sequence:
  //   length(4, big-endian) | type(4 ASCII) | data(length) | crc32(4,
  //   over type+data). Ancillary chunks (bit 5 of the first type byte set,
  //   i.e. lowercase first letter: tEXt, zTXt, iTXt, eXIf, tIME, ...) carry
  //   metadata — author, GPS, camera serial — and are where image PII
  //   lives; critical chunks (IHDR, PLTE, IDAT, IEND) carry the pixels.

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** (type, dataLength, fileOffset) of every chunk, in file order. */
  def chunks(png: Array[Byte]): Seq[(String, Int, Int)] = {
    require(isPng(png), "not a PNG: missing signature")
    val out = Seq.newBuilder[(String, Int, Int)]
    var off = 8
    while (off + 8 <= png.length) {
      val len = beInt(png, off)
      val typ = new String(png, off + 4, 4, "US-ASCII")
      out += ((typ, len, off))
      off += 12 + len
    }
    require(off == png.length, s"truncated/garbled chunk stream at $off/${png.length}")
    out.result()
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = data.length
    out.write((len >>> 24) & 0xff); out.write((len >>> 16) & 0xff)
    out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    val typB = typ.getBytes("US-ASCII")
    require(typB.length == 4, s"bad chunk type '$typ'")
    out.write(typB)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typB); crc.update(data)
    val c = crc.getValue
    out.write(((c >>> 24) & 0xff).toInt); out.write(((c >>> 16) & 0xff).toInt)
    out.write(((c >>> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
  }

  /** Insert `tEXt` metadata chunks (keyword → value, Latin-1) right after
    * IHDR — the fixture producer for metadata-scrub tests (real-world PNGs
    * arrive with these already present). */
  def withTextChunks(png: Array[Byte], entries: Seq[(String, String)]): Array[Byte] = {
    if (entries.isEmpty) return png
    val cs = chunks(png)
    require(cs.headOption.exists(_._1 == "IHDR"), "PNG must start with IHDR")
    val ihdrEnd = cs.head._3 + 12 + cs.head._2
    val out = new ByteArrayOutputStream(png.length + entries.map(_._2.length + 30).sum)
    out.write(png, 0, ihdrEnd)
    entries.foreach { case (k, v) =>
      val kb = k.getBytes("ISO-8859-1"); val vb = v.getBytes("ISO-8859-1")
      require(kb.nonEmpty && kb.length <= 79, s"bad tEXt keyword '$k'")
      val data = new Array[Byte](kb.length + 1 + vb.length)
      System.arraycopy(kb, 0, data, 0, kb.length)
      data(kb.length) = 0
      System.arraycopy(vb, 0, data, kb.length + 1, vb.length)
      writeChunk(out, "tEXt", data)
    }
    out.write(png, ihdrEnd, png.length - ihdrEnd)
    out.toByteArray
  }

  /** Strip every ancillary chunk, keeping the critical pixel path
    * (IHDR/PLTE/IDAT/IEND and any other uppercase-initial chunk) —
    * byte-identical critical chunks, so the decoded pixels are untouched
    * by construction. */
  def stripAncillary(png: Array[Byte]): Array[Byte] = {
    val cs = chunks(png)
    val out = new ByteArrayOutputStream(png.length)
    out.write(png, 0, 8)
    cs.foreach { case (typ, len, off) =>
      if ((typ.charAt(0) & 0x20) == 0) // uppercase initial = critical
        out.write(png, off, 12 + len)
    }
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
