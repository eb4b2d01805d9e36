package graft.operators

/** Real in-JVM video codec for uncompressed AVI (RIFF form `AVI `, one
  * `vids`/`DIB ` stream of 24-bit bottom-up device-independent-bitmap
  * frames) — the video leg of the multimodal decode stage. Like BMP
  * ([[BmpCodec]]) and WAV ([[WavCodec]]), uncompressed AVI is self-contained
  * little-endian byte math (RIFF chunk framing, an `hdrl` header list with
  * `avih`/`strh`/`strf`, frame payloads as `00db` chunks inside a `movi`
  * list), so decode runs on executors with zero native dependencies and
  * every decoded pixel is bit-exact — which lets the m07 oracle reproduce
  * downstream features analytically from the frame-generating functions
  * (the m03/m04 technique extended over a frame axis).
  *
  * Format per the public RIFF/AVI layout (OpenDML / original MS AVI spec):
  * bytes 0-3 "RIFF", 4-7 riff size, 8-11 "AVI ", then chunks
  * `[4-byte id][4-byte size][payload, padded to even]`; `LIST` chunks carry
  * a 4-byte list type followed by subchunks. `hdrl` holds `avih` (main
  * header: µs/frame, total frames, streams, width, height) and one `strl`
  * per stream with `strh` (fccType `vids`, handler `DIB `, scale/rate,
  * length) and `strf` (a BITMAPINFOHEADER, same 40-byte struct as BMP).
  * `movi` holds one `00db` chunk per frame whose payload is a raw DIB pixel
  * array: bottom-up B,G,R rows padded to a multiple of 4 — exactly BMP's
  * pixel-array layout. Decode skips unknown chunks (`JUNK`, `idx1`,
  * `INFO`, ...) including the odd-length pad byte.
  */
object AviCodec {

  /** Sanity cap on claimed frame dimensions (32k × 32k × 3 B ≈ 3 GiB —
    * far beyond any DIB AVI, well inside Int for the size math). */
  val MaxDim = 32768

  /** Decoded video: per-frame top-down interleaved RGB, normalized to the
    * same shape as [[BmpCodec.DecodedImage]] so every image consumer works
    * per frame unchanged. */
  final case class DecodedVideo(width: Int, height: Int, fps: Int,
                                frames: Array[BmpCodec.DecodedImage])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def rowStride(width: Int): Int = (3 * width + 3) & ~3

  /** 12-byte AVI signature: RIFF size "AVI ". */
  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI "

  /** Decode an uncompressed 24-bit DIB AVI. Walks the top-level chunk list,
    * pulls geometry from the `strf` BITMAPINFOHEADER inside `hdrl`, then
    * collects every `00db`/`00dc` frame inside `movi`; throws on anything
    * that isn't uncompressed 24-bit video — loud beats silently garbled
    * frames. */
  def decode(bytes: Array[Byte]): DecodedVideo = {
    require(bytes.length >= 12, s"AVI too short: ${bytes.length} bytes")
    require(isAvi(bytes), "not an AVI: missing RIFF/AVI magic")
    var width = -1
    var height = -1
    var fps = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[BmpCodec.DecodedImage]

    // parse the strf BITMAPINFOHEADER (BMP's header struct, no file header)
    def parseStrf(off: Int, size: Int): Unit = {
      require(size >= 40, s"strf too short: $size")
      val biSize = le32(bytes, off)
      require(biSize >= 40, s"bad BITMAPINFOHEADER size $biSize")
      width = le32(bytes, off + 4)
      height = le32(bytes, off + 8)
      val bpp = le16(bytes, off + 14)
      val compression = le32(bytes, off + 16)
      require(bpp == 24, s"unsupported bpp $bpp (only 24-bit DIB)")
      require(compression == 0, s"unsupported compression $compression (only BI_RGB)")
      require(width > 0 && height > 0, s"bad dims ${width}x$height")
      // cap claimed dims so stride*height / width*height*3 below can't wrap
      // Int on adversarial headers (a frame can never exceed the file anyway)
      require(width <= MaxDim && height <= MaxDim,
        s"dims ${width}x$height exceed sanity cap $MaxDim")
    }

    def parseFrame(off: Int, size: Int): Unit = {
      require(width > 0, "movi frame before hdrl geometry")
      val stride = rowStride(width)
      val need = stride.toLong * height // Long: dim caps keep this honest too
      require(size >= need,
        s"truncated frame: need $need, have $size")
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = off + stride * (height - 1 - y) // DIB rows are bottom-up
        var x = 0
        while (x < width) {
          val s = srcRow + 3 * x
          val d = (y * width + x) * 3
          out(d) = bytes(s + 2)     // R (stored B,G,R)
          out(d + 1) = bytes(s + 1) // G
          out(d + 2) = bytes(s)     // B
          x += 1
        }
        y += 1
      }
      frames += BmpCodec.DecodedImage(width, height, out)
    }

    // walk subchunks of [off, end); descend into LISTs we care about
    def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = tag(bytes, off)
        val size = le32(bytes, off + 4)
        // Long bounds math: a hostile size near 2^31 would wrap off+8+size
        // negative in Int and sail past the `<= end` check
        require(size >= 0 && off.toLong + 8 + size <= end,
          s"truncated chunk '$id': size $size at offset $off (list ends $end)")
        id match {
          case "LIST" =>
            val listType = tag(bytes, off + 8)
            // hdrl (headers), strl (per-stream), movi (frames): descend;
            // INFO and anything else: skip
            if (listType == "hdrl" || listType == "strl")
              walk(off + 12, off + 8 + size, inMovi = false)
            else if (listType == "movi")
              walk(off + 12, off + 8 + size, inMovi = true)
          case "strf" if !inMovi => parseStrf(off + 8, size)
          case "strh" if !inMovi =>
            val fccType = tag(bytes, off + 8)
            if (fccType == "vids") {
              val scale = le32(bytes, off + 28)
              val rate = le32(bytes, off + 32)
              if (scale > 0) fps = rate / scale
            }
          case "00db" | "00dc" if inMovi => parseFrame(off + 8, size)
          case _ => () // avih, JUNK, idx1, ... — geometry comes from strf
        }
        off += 8 + size + (size & 1) // chunks are padded to even length
      }
    }

    walk(12, bytes.length, inMovi = false)
    require(width > 0, "no strf header found")
    require(frames.nonEmpty, "no frames found in movi list")
    DecodedVideo(width, height, fps, frames.toArray)
  }

  /** Encode an uncompressed 24-bit DIB AVI from an (f, x, y) → (r, g, b)
    * frame-pixel function with y = 0 the TOP row of each frame — a valid
    * file any player opens; the fixture producer for m07 and the
    * AviCodecSpec round trips. */
  def encode(width: Int, height: Int, nFrames: Int, fps: Int,
             rgb: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(nFrames > 0, s"bad frame count $nFrames")
    require(fps > 0, s"bad fps $fps")
    val stride = rowStride(width)
    val frameBytes = stride * height // multiple of 4 — even, no pad byte
    val strlSize = 4 + (8 + 56) + (8 + 40)          // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)    // 'hdrl' + avih + LIST strl
    val moviSize = 4 + nFrames * (8 + frameBytes)   // 'movi' + 00db frames
    val fileSize = 12 + (8 + hdrlSize) + (8 + moviSize)
    val b = new Array[Byte](fileSize)
    var o = 0
    def putTag(s: String): Unit = { var i = 0; while (i < 4) { b(o + i) = s.charAt(i).toByte; i += 1 }; o += 4 }
    def putLe16(v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte; o += 2 }
    def putLe32(v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte; o += 4
    }
    putTag("RIFF"); putLe32(fileSize - 8); putTag("AVI ")
    putTag("LIST"); putLe32(hdrlSize); putTag("hdrl")
    putTag("avih"); putLe32(56)
    putLe32(1000000 / fps)       // dwMicroSecPerFrame
    putLe32(frameBytes * fps)    // dwMaxBytesPerSec
    putLe32(0)                   // dwPaddingGranularity
    putLe32(0)                   // dwFlags (no idx1 written)
    putLe32(nFrames)             // dwTotalFrames
    putLe32(0)                   // dwInitialFrames
    putLe32(1)                   // dwStreams
    putLe32(frameBytes)          // dwSuggestedBufferSize
    putLe32(width); putLe32(height)
    putLe32(0); putLe32(0); putLe32(0); putLe32(0) // dwReserved[4]
    putTag("LIST"); putLe32(strlSize); putTag("strl")
    putTag("strh"); putLe32(56)
    putTag("vids"); putTag("DIB ")
    putLe32(0)                   // dwFlags
    putLe16(0); putLe16(0)       // wPriority, wLanguage
    putLe32(0)                   // dwInitialFrames
    putLe32(1)                   // dwScale
    putLe32(fps)                 // dwRate (rate/scale = fps)
    putLe32(0)                   // dwStart
    putLe32(nFrames)             // dwLength
    putLe32(frameBytes)          // dwSuggestedBufferSize
    putLe32(-1)                  // dwQuality (default)
    putLe32(0)                   // dwSampleSize
    putLe16(0); putLe16(0); putLe16(width); putLe16(height) // rcFrame
    putTag("strf"); putLe32(40)
    putLe32(40)                  // biSize
    putLe32(width); putLe32(height) // positive height: bottom-up
    putLe16(1); putLe16(24)      // biPlanes, biBitCount
    putLe32(0)                   // BI_RGB
    putLe32(frameBytes)          // biSizeImage
    putLe32(0); putLe32(0); putLe32(0); putLe32(0) // pels/clr fields
    putTag("LIST"); putLe32(moviSize); putTag("movi")
    var f = 0
    while (f < nFrames) {
      putTag("00db"); putLe32(frameBytes)
      var y = 0
      while (y < height) {
        val dstRow = o + stride * (height - 1 - y) // bottom-up storage
        var x = 0
        while (x < width) {
          val (r, g, bl) = rgb(f, x, y)
          val d = dstRow + 3 * x
          b(d) = bl.toByte; b(d + 1) = g.toByte; b(d + 2) = r.toByte
          x += 1
        }
        y += 1
      }
      o += frameBytes
      f += 1
    }
    require(o == fileSize, s"encoder size mismatch: wrote $o of $fileSize")
    b
  }
}
