package graft.functions

import graft.SparkSpec
import graft.operators.{Dedup, WavCodec}

/** Pins the audio-fingerprint contract behind m06: the energy-gradient hash
  * is invariant to exact integer gain scaling (the audio analog of dHash's
  * brightness invariance), a perturbation confined to one frame flips at
  * most two bits (so the rendition still PAIRS through the pigeonhole
  * Hamming join), and distinct clips stay far apart. */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  // group-specific "texture": bounded pseudo-random samples in ±7000 so a
  // ×4 gain stays inside 16-bit range
  private def clip(seed: Long, n: Int, gain: Int, spike: Int = 0): Array[Byte] = {
    val s = Array.tabulate(n) { i =>
      val base = (((seed + 5) * (i.toLong * i + 3 * i + 7) + (2 * seed + 1) * i) % 14001) - 7000
      val sp = if (i == 0) spike else 0
      (gain * (base + sp)).toShort
    }
    WavCodec.encode(16000, 1, s)
  }

  test("fingerprint is invariant to exact integer gain scaling") {
    for (seed <- 0L until 20L; gain <- 2 to 4) {
      val n = ((seed % 5) + 3).toInt * 57
      assert(AudioHashExpr.compute(clip(seed, n, 1)) ==
        AudioHashExpr.compute(clip(seed, n, gain)),
        s"seed $seed gain $gain: fingerprint changed under gain")
    }
  }

  test("single-frame perturbation flips at most two bits") {
    for (seed <- 0L until 20L) {
      val n = ((seed % 5) + 3).toInt * 57
      val d = java.lang.Long.bitCount(
        AudioHashExpr.compute(clip(seed, n, 1)) ^
          AudioHashExpr.compute(clip(seed, n, 1, spike = 1000)))
      assert(d <= 2, s"seed $seed: spike flipped $d bits")
    }
  }

  test("fingerprint is 56-bit and distinct clips stay far apart") {
    val fps = (0L until 30L).map(s => AudioHashExpr.compute(clip(s, 285, 1)))
    fps.foreach(fp => assert(fp >= 0L && (fp >>> 56) == 0L))
    for (i <- fps.indices; j <- 0 until i) {
      val d = java.lang.Long.bitCount(fps(i) ^ fps(j))
      assert(d > 6, s"clips $i/$j unexpectedly close: hamming $d")
    }
  }

  test("frame boundaries follow the f*n/57 integer rule on ragged lengths") {
    // n not a multiple of 57: first frames are empty (energy 0); the hash
    // must still be well-defined and stable
    val short = clip(3, 60, 1)
    assert(AudioHashExpr.compute(short) == AudioHashExpr.compute(short))
    val tiny = clip(3, 5, 1) // fewer samples than frames
    assert((AudioHashExpr.compute(tiny) >>> 56) == 0L)
  }

  test("audioNearDup pairs gain/spike renditions, not distinct clips") {
    val rows = (0L until 40L).map { id =>
      val gid = id / 4
      val n = ((gid % 5) + 3).toInt * 57
      val gain = (id % 4 + 1).toInt
      val spike = if (id % 5 == 0) 1000 else 0
      (id, clip(gid, n, gain, spike))
    }
    val media = rows.toDF("media_id", "media")
    val pairs = Dedup.audioNearDup(media, "media_id", "media")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // same-group renditions must pair (gain exact-invariant, spike ≤ 2 bits)
    for (g <- 0L until 10L; a <- 0L until 4L; b <- (a + 1) until 4L)
      assert(pairs.contains((g * 4 + a, g * 4 + b)),
        s"missing same-group pair (${g * 4 + a}, ${g * 4 + b})")
    // no cross-group pair survives the Hamming cut
    pairs.foreach { case (a, b) => assert(a / 4 == b / 4, s"cross-group pair ($a, $b)") }
  }
}
