package graft.functions

import graft.SparkSpec
import graft.operators.{BmpCodec, Dedup, ImageCodec, PngCodec}

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
}
