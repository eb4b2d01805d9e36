package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the AVI container contract behind m07: encode → decode round trips
  * every frame bit-exactly across all DIB stride residues, the frame decode
  * agrees with the BMP decode of the same pixel function (shared DIB pixel
  * layout), unknown chunks are skipped, and malformed input fails loudly. */
class AviCodecSpec extends AnyFunSuite {

  private def texture(seed: Long, f: Int)(x: Int, y: Int): (Int, Int, Int) = (
    (((seed + 3) * (x + 1) * (y + 2) + 11L * f * (x + y + 1)) % 199).toInt,
    (((seed + 7) * (x + 2) * (y + 1) + 13L * f * (y + 1)) % 199).toInt,
    (((2 * seed + 1) * (x.toLong * y + x + y) + 17L * f * f) % 199).toInt)

  test("round trip is bit-exact for every stride residue and frame count") {
    for (seed <- 0L until 12L) {
      val w = (seed % 9 + 6).toInt // 6..14 — every 4-byte row-padding residue
      val h = (seed % 5 + 8).toInt
      val nF = 8 * (seed % 3 + 1).toInt
      val v = AviCodec.decode(
        AviCodec.encode(w, h, nF, 10, (f, x, y) => texture(seed, f)(x, y)))
      assert(v.width == w && v.height == h && v.fps == 10)
      assert(v.frames.length == nF)
      for (f <- 0 until nF) {
        val expect = BmpCodec.decode(BmpCodec.encode(w, h, texture(seed, f)))
        assert(java.util.Arrays.equals(v.frames(f).pixels, expect.pixels),
          s"seed $seed frame $f: AVI frame differs from BMP decode")
      }
    }
  }

  test("decode skips unknown chunks (JUNK before hdrl, idx1 after movi)") {
    val avi = AviCodec.encode(7, 9, 8, 10, (f, x, y) => texture(5, f)(x, y))
    // splice a JUNK chunk right after the RIFF form header and an idx1-like
    // chunk at the end — both must be ignored (odd size exercises padding)
    val junk = Array[Byte]('J', 'U', 'N', 'K', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val idx1 = Array[Byte]('i', 'd', 'x', '1', 4, 0, 0, 0, 9, 9, 9, 9)
    val spliced = new java.io.ByteArrayOutputStream()
    spliced.write(avi, 0, 12)
    spliced.write(junk)
    spliced.write(avi, 12, avi.length - 12)
    spliced.write(idx1)
    val bytes = spliced.toByteArray
    // patch the RIFF size to cover the splices
    val newSize = bytes.length - 8
    bytes(4) = newSize.toByte; bytes(5) = (newSize >> 8).toByte
    bytes(6) = (newSize >> 16).toByte; bytes(7) = (newSize >> 24).toByte
    val v = AviCodec.decode(bytes)
    assert(v.frames.length == 8 && v.width == 7 && v.height == 9)
    assert(java.util.Arrays.equals(
      v.frames(3).pixels, AviCodec.decode(avi).frames(3).pixels))
  }

  test("malformed input fails loudly") {
    assertThrows[IllegalArgumentException](AviCodec.decode(Array[Byte](1, 2, 3)))
    assertThrows[IllegalArgumentException]( // WAV magic, not AVI
      AviCodec.decode(WavCodec.encode(16000, 1, Array[Short](1, 2, 3, 4))))
    val avi = AviCodec.encode(6, 8, 8, 10, (f, x, y) => texture(1, f)(x, y))
    assertThrows[IllegalArgumentException]( // truncated mid-movi
      AviCodec.decode(java.util.Arrays.copyOf(avi, avi.length - 10)))
  }

  test("adversarial headers fail loudly, not via Int wraparound") {
    val avi = AviCodec.encode(6, 8, 2, 10, (f, x, y) => texture(2, f)(x, y))
    def patchLe32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    // (a) chunk size near 2^31: off+8+size wraps negative in Int and would
    // pass `<= end` without the Long bounds math
    val bomb = avi.clone()
    patchLe32(bomb, 16, Int.MaxValue - 4) // first LIST chunk's size field
    val e1 = intercept[IllegalArgumentException](AviCodec.decode(bomb))
    assert(e1.getMessage.contains("truncated chunk"))
    // (b) huge claimed dims in strf: stride*height would wrap (or allocate
    // garbage) without the dim cap — must be the cap's IAE, not NegativeArraySize
    val strfOff = {
      var o = -1; var i = 12
      while (o < 0 && i + 8 <= avi.length) {
        if (new String(avi, i, 4, "US-ASCII") == "strf") o = i
        i += 1
      }
      o + 8
    }
    val huge = avi.clone()
    patchLe32(huge, strfOff + 4, 0x40000000) // biWidth = 2^30
    patchLe32(huge, strfOff + 8, 0x40000000) // biHeight = 2^30
    val e2 = intercept[IllegalArgumentException](AviCodec.decode(huge))
    assert(e2.getMessage.contains("sanity cap"))
  }
}
