package graft.functions

import graft.SparkSpec
import graft.operators.{BmpCodec, Dedup, ImageCodec, JpegCodec, PngCodec}

/** Pins the perceptual-hash contract behind m04: dHash is invariant to
  * uniform brightness shifts, a 1-pixel perturbation flips at most one bit
  * (so the perturbed image still PAIRS with its original through the
  * pigeonhole Hamming join), and distinct textures stay far apart. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  // group-specific texture: nonlinear in (x, y) with enough brightness
  // headroom (mod 199 + shift ≤ 46 < 256) that no channel clamps
  private def texture(seed: Long)(x: Int, y: Int): (Int, Int, Int) = (
    (((seed + 3) * (x + 1) * (y + 2) + 5L * x * x) % 199).toInt,
    (((seed + 7) * (x + 2) * (y + 1) + 3L * y * y) % 199).toInt,
    (((2 * seed + 1) * (x.toLong * y + x + y)) % 199).toInt)

  private def shifted(f: (Int, Int) => (Int, Int, Int), d: Int)(x: Int, y: Int) = {
    val (r, g, b) = f(x, y); (r + d, g + d, b + d)
  }

  test("dHash is invariant to a uniform brightness shift") {
    val base = BmpCodec.encode(11, 9, texture(17))
    val bright = BmpCodec.encode(11, 9, shifted(texture(17), 6))
    assert(DHashExpr.compute(base) == DHashExpr.compute(bright))
  }

  test("single-pixel perturbation flips at most one bit") {
    for (seed <- 0L until 20L) {
      val w = (seed % 9 + 6).toInt; val h = (seed % 5 + 8).toInt
      val base = BmpCodec.encode(w, h, texture(seed))
      val spotted = BmpCodec.encode(w, h, (x, y) => {
        val (r, g, b) = texture(seed)(x, y)
        if (x == 0 && y == 0) (r + 40, g + 40, b + 40) else (r, g, b)
      })
      val d = java.lang.Long.bitCount(
        DHashExpr.compute(base) ^ DHashExpr.compute(spotted))
      assert(d <= 1, s"seed $seed: spot flipped $d bits")
    }
  }

  test("fingerprint is 56-bit (non-negative, bits above 55 clear)") {
    for (seed <- 0L until 20L) {
      val fp = DHashExpr.compute(BmpCodec.encode(12, 10, texture(seed)))
      assert(fp >= 0L && (fp >>> 56) == 0L)
    }
  }

  test("PNG round trip is lossless and matches the BMP decode bit-for-bit") {
    for (seed <- 0L until 20L) {
      val w = (seed % 9 + 5).toInt; val h = (seed % 5 + 7).toInt
      val png = PngCodec.decode(PngCodec.encode(w, h, texture(seed)))
      val bmp = BmpCodec.decode(BmpCodec.encode(w, h, texture(seed)))
      assert(png.width == bmp.width && png.height == bmp.height)
      assert(java.util.Arrays.equals(png.pixels, bmp.pixels),
        s"seed $seed: PNG pixels differ from BMP pixels")
    }
  }

  test("ImageCodec sniffs the format; dHash is format-invariant") {
    for (seed <- 0L until 20L) {
      val w = (seed % 9 + 6).toInt; val h = (seed % 5 + 8).toInt
      val png = PngCodec.encode(w, h, texture(seed))
      val bmp = BmpCodec.encode(w, h, texture(seed))
      assert(ImageCodec.decode(png).pixels.sameElements(ImageCodec.decode(bmp).pixels))
      assert(DHashExpr.compute(png) == DHashExpr.compute(bmp),
        s"seed $seed: dHash differs across formats")
    }
    assertThrows[IllegalArgumentException](
      ImageCodec.decode(Array[Byte](0x42, 0x41, 0, 0)))
  }

  test("imageNearDup pairs a PNG rendition with a BMP rendition") {
    val rows = Seq(
      (1L, BmpCodec.encode(11, 9, texture(17))),
      (2L, PngCodec.encode(11, 9, shifted(texture(17), 4))), // PNG brightness copy
      (3L, PngCodec.encode(11, 9, texture(911))))            // PNG distinct texture
    val pairs = Dedup.imageNearDup(rows.toDF("media_id", "media"), "media_id", "media")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("imageNearDup pairs perturbed renditions, not distinct textures") {
    val rows = Seq(
      (1L, BmpCodec.encode(11, 9, texture(17))),
      (2L, BmpCodec.encode(11, 9, shifted(texture(17), 5))), // brightness copy
      (3L, BmpCodec.encode(11, 9, (x, y) => {                // 1-px perturbed
        val (r, g, b) = texture(17)(x, y)
        if (x == 0 && y == 0) (r + 40, g + 40, b + 40) else (r, g, b)
      })),
      (4L, BmpCodec.encode(11, 9, texture(911))))            // different texture
    val media = rows.toDF("media_id", "media")
    val pairs = Dedup.imageNearDup(media, "media_id", "media")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "brightness-shifted copy must pair")
    assert(pairs.contains((1L, 3L)), "1-pixel-perturbed copy must pair")
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "distinct texture must not pair")
  }

  // ── JPEG (m09): lossy decode is spec-verified, not oracle-verified — see
  // JpegCodec scaladoc. Smooth gradients give the dHash sample points a
  // brightness margin well above JPEG q90 error; `dir` flips the gradient
  // direction so distinct images land far apart in dHash. ──
  private def gradient(dir: Int)(x: Int, y: Int): (Int, Int, Int) =
    if (dir == 0) (math.min(10 * x + 3 * y, 255), math.min(8 * y + 40, 255), math.min(6 * x + 20, 255))
    else (math.max(235 - 10 * x - 3 * y, 0), math.max(215 - 8 * y, 0), math.max(200 - 6 * x, 0))

  test("JPEG: JDK writer emits JFIF, sniffing covers JFIF + EXIF, codec dispatches") {
    val jfif = JpegCodec.encode(16, 12, gradient(0))
    assert(JpegCodec.isJpeg(jfif))
    assert((jfif(3) & 0xff) == 0xe0, "JDK writer should emit an APP0/JFIF marker")
    // EXIF variant: same stream with an APP1 marker — sniffing must accept it
    val exif = jfif.clone(); exif(3) = 0xe1.toByte
    assert(JpegCodec.isJpeg(exif))
    assert(!JpegCodec.isJpeg(PngCodec.encode(4, 4, gradient(0))))
    // dispatch: ImageCodec routes JPEG bytes to the JPEG decoder
    val viaDispatch = ImageCodec.decode(jfif)
    assert(viaDispatch.width == 16 && viaDispatch.height == 12)
  }

  test("JPEG decode is deterministic: same bytes, same pixels") {
    for (seed <- 0 until 10) {
      val w = seed % 9 + 8; val h = seed % 5 + 8
      val bytes = JpegCodec.encode(w, h, gradient(seed % 2))
      val a = JpegCodec.decode(bytes); val b = JpegCodec.decode(bytes)
      assert(a.width == w && a.height == h)
      assert(java.util.Arrays.equals(a.pixels, b.pixels),
        s"seed $seed: two decodes of the same bytes differ")
    }
  }

  test("dHash is stable under quality-90 JPEG re-encode of BMP fixtures") {
    for (seed <- 0 until 10) {
      val w = seed % 9 + 10; val h = seed % 5 + 10
      val bmp = BmpCodec.decode(BmpCodec.encode(w, h, gradient(seed % 2)))
      val jpeg = JpegCodec.reencode(bmp, 0.9f)
      val d = java.lang.Long.bitCount(
        DHashExpr.compute(BmpCodec.encode(w, h, gradient(seed % 2)))
          ^ DHashExpr.compute(jpeg))
      // within the pigeonhole join's default pairing radius (maxHamming=3)
      assert(d <= 3, s"seed $seed: q90 re-encode flipped $d of 56 bits")
    }
    // opposite gradient directions stay far apart across the lossy boundary
    val a = DHashExpr.compute(JpegCodec.encode(14, 12, gradient(0)))
    val b = DHashExpr.compute(JpegCodec.encode(14, 12, gradient(1)))
    assert(java.lang.Long.bitCount(a ^ b) > 20, "distinct images collapsed")
  }

  test("imageNearDup pairs a JPEG rendition with its BMP original") {
    val rows = Seq(
      (1L, BmpCodec.encode(14, 12, gradient(0))),
      (2L, JpegCodec.reencode(
        BmpCodec.decode(BmpCodec.encode(14, 12, gradient(0))), 0.9f)),
      (3L, JpegCodec.encode(14, 12, gradient(1)))) // distinct image
    val pairs = Dedup.imageNearDup(rows.toDF("media_id", "media"), "media_id", "media")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }
}
