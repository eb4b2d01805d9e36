package graft.functions

import graft.SparkSpec
import graft.operators.{AviCodec, Dedup}

/** Pins the video-fingerprint contract behind m07: the keyframe rotate-XOR
  * fold is invariant to uniform brightness shifts, a 1-pixel perturbation of
  * one keyframe flips at most one bit (so the rendition still PAIRS through
  * the pigeonhole Hamming join), frame ORDER matters (the property plain
  * XOR would lose), and the fingerprint stays in the 56-bit portability
  * envelope. */
class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  private def texture(seed: Long, f: Int)(x: Int, y: Int): (Int, Int, Int) = (
    (((seed + 3) * (x + 1) * (y + 2) + 5L * x * x + 11L * f * (x + y + 1)) % 199).toInt,
    (((seed + 7) * (x + 2) * (y + 1) + 3L * y * y + 13L * f * (y + 1)) % 199).toInt,
    (((2 * seed + 1) * (x.toLong * y + x + y) + 17L * f * f) % 199).toInt)

  private def clip(seed: Long, bright: Int = 0, spot: Int = 0,
                   swap: Option[(Int, Int)] = None): Array[Byte] = {
    val w = (seed % 9 + 6).toInt; val h = (seed % 5 + 8).toInt
    val nF = 8 * (seed % 3 + 1).toInt
    AviCodec.encode(w, h, nF, 10, (f0, x, y) => {
      val f = swap match {
        case Some((a, b)) if f0 == a => b
        case Some((a, b)) if f0 == b => a
        case _ => f0
      }
      val (r, g, b) = texture(seed, f)(x, y)
      val sp = if (f == 0 && x == 0 && y == 0) spot else 0
      (r + bright + sp, g + bright + sp, b + bright + sp)
    })
  }

  test("fingerprint is invariant to a uniform brightness shift") {
    for (seed <- 0L until 12L)
      assert(VideoHashExpr.compute(clip(seed)) ==
        VideoHashExpr.compute(clip(seed, bright = 6)), s"seed $seed")
  }

  test("single-pixel keyframe perturbation flips at most one bit") {
    for (seed <- 0L until 12L) {
      val d = java.lang.Long.bitCount(VideoHashExpr.compute(clip(seed)) ^
        VideoHashExpr.compute(clip(seed, spot = 40)))
      assert(d <= 1, s"seed $seed: spot flipped $d bits")
    }
  }

  test("keyframe order matters (rotation makes the XOR fold order-sensitive)") {
    // swapping two keyframes changes the fingerprint even though the SET of
    // frame hashes is unchanged — plain XOR would collapse the two clips
    var distinct = 0
    for (seed <- 0L until 12L) {
      val m = (seed % 3 + 1).toInt // keyframes sit at multiples of m
      val base = VideoHashExpr.compute(clip(seed))
      val swapped = VideoHashExpr.compute(clip(seed, swap = Some((1 * m, 5 * m))))
      if (base != swapped) distinct += 1
    }
    assert(distinct >= 11, s"only $distinct/12 reordered clips re-fingerprinted")
  }

  test("fingerprint is 56-bit (non-negative, bits above 55 clear)") {
    for (seed <- 0L until 12L) {
      val fp = VideoHashExpr.compute(clip(seed))
      assert(fp >= 0L && (fp >>> 56) == 0L)
    }
  }

  test("videoNearDup pairs renditions, separates textures, keeps bytes off the shuffle") {
    val rows = Seq(
      (1L, clip(17)),
      (2L, clip(17, bright = 4)),  // brightness rendition of 1
      (3L, clip(17, spot = 40)),   // spotted rendition of 1
      (4L, clip(911)))             // distinct clip
    val pairs = Dedup.videoNearDup(rows.toDF("media_id", "media"), "media_id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }
}
