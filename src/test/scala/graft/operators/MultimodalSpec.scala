package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures: deterministic stub features over binary media") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "aaaa".getBytes, 100, 100, 0),
      Multimodal.MediaRow(2L, "image", "abab".getBytes, 200, 100, 0),
      Multimodal.MediaRow(3L, "audio", Array.emptyByteArray, 0, 0, 16000))
      .toDS()
    val got = Multimodal.extractFeatures(media, frames = 2)
      .collect().sortBy(_.media_id)
    assert(got(0).n_bytes == 4 && got(0).byte_entropy == 0.0) // uniform bytes
    assert(math.abs(got(1).byte_entropy - 1.0) < 1e-12)       // two symbols 50/50
    assert(got(0).thumb_bytes == math.max(1L, 4L * 64 * 64 / (100L * 100L)))
    assert(got(1).frame_offsets == Seq(0L, 2L))
    assert(got(2).n_bytes == 0 && got(2).frame_offsets.isEmpty && got(2).thumb_bytes == 0)
  }

  test("imageQuality (m13): flat image fails contrast, tiny image fails " +
      "pixels, textured large image passes; stats exact") {
    val flat = BmpCodec.encode(8, 8, (_, _) => (10, 20, 30))      // lum 60 everywhere
    val tiny = BmpCodec.encode(3, 3, (x, y) => (x * 80, y * 80, 0)) // 9 px < 16
    val good = BmpCodec.encode(8, 8, (x, y) => (x * 30, y * 30, 5))
    val media = Seq((1L, flat), (2L, tiny), (3L, good)).toDF("media_id", "media")
    val got = Multimodal.imageQuality(media, "media_id", "media")
      .collect().map(q => q.media_id -> q).toMap
    assert(got(1L).contrast == 0 && got(1L).n_distinct_lum == 1 && !got(1L).keep)
    assert(got(2L).n_pixels == 9 && got(2L).contrast == 320 && !got(2L).keep)
    assert(got(3L).min_lum == 5 && got(3L).max_lum == 7 * 30 * 2 + 5 &&
      got(3L).keep, s"expected pass: ${got(3L)}")
    // distinct luminances of good: {30(x+y)+5 : x,y in 0..7} -> 15 values
    assert(got(3L).n_distinct_lum == 15)
  }

  test("videoFrameSample (m14): stride honored, flat frames gated out, " +
      "textured frames kept with exact stats") {
    // 8 frames: even frames textured, odd frames solid gray
    val avi = AviCodec.encode(4, 4, 8, 10, (f, x, y) =>
      if (f % 2 == 1) (50, 50, 50) else (x * 40, y * 40, f))
    val media = Seq((7L, avi)).toDF("media_id", "media")
    val got = Multimodal.videoFrameSample(media, "media_id", "media",
        every = 2, minContrast = 30)
      .collect().sortBy(_.frame)
    assert(got.map(_.frame).toSeq == Seq(0, 2, 4, 6), "every-2nd frame")
    got.foreach { s =>
      // textured frame f: lum = 40x + 40y + f, x,y in 0..3
      assert(s.min_lum == s.frame && s.max_lum == 240 + s.frame &&
        s.contrast == 240 && s.keep, s"frame stats wrong: $s")
    }
    val all = Multimodal.videoFrameSample(media, "media_id", "media",
        every = 1, minContrast = 30)
      .collect().sortBy(_.frame)
    assert(all.length == 8)
    all.filter(_.frame % 2 == 1).foreach { s =>
      assert(s.contrast == 0 && !s.keep, s"flat frame must be gated: $s")
    }
  }

  test("audioQuality (m15): clipping detected at both rails, silence " +
      "ratio exact, clean loud track kept") {
    val loud = WavCodec.encode(16000, 1, Array.fill(64)(2000.toShort))
    val silent = WavCodec.encode(16000, 1, Array.fill(64)(1.toShort))
    val clippedPos = WavCodec.encode(16000, 1,
      Array.tabulate(64)(i => if (i == 5) Short.MaxValue else 2000.toShort))
    val clippedNeg = WavCodec.encode(16000, 1,
      Array.tabulate(64)(i => if (i == 9) Short.MinValue else 2000.toShort))
    val media = Seq((1L, loud), (2L, silent), (3L, clippedPos), (4L, clippedNeg))
      .toDF("media_id", "media")
    val got = Multimodal.audioQuality(media, "media_id", "media",
        spf = 8, silenceThreshold = 1000L)
      .collect().map(q => q.media_id -> q).toMap
    assert(got(1L).keep && got(1L).n_silent == 0 && got(1L).n_clipped == 0)
    assert(!got(2L).keep && got(2L).silence_ratio == 1.0)
    assert(!got(3L).keep && got(3L).n_clipped == 1)
    assert(!got(4L).keep && got(4L).n_clipped == 1)
  }

  test("mediaFromDocuments builds a well-typed media table from testdata") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == docs.count())
    assert(feats.filter($"byte_entropy" <= 0).count() == 0)
  }

  test("m02 fixture is genuinely binary (full byte range, parquet roundtrip)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val payload = docs.select(unhex(md5($"doc_id".cast("string"))).as("media"))
    val tmp = java.nio.file.Files.createTempDirectory("m02-spec-").toString
    payload.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp).as[Array[Byte]].collect()
    // md5 bytes span the high half of the byte range — the property UTF-8
    // text payloads (m01) can never exercise
    assert(back.exists(_.exists(b => (b & 0xff) > 127)))
    assert(back.forall(_.length == 16))
  }

  // The canonical 2x2 24-bit BMP from the public format documentation,
  // byte-by-byte BY HAND (not produced by our encoder — that would be
  // circular): top-left blue, top-right green, bottom-left red,
  // bottom-right white; stored bottom-up, rows padded to 4 bytes.
  private val canonical2x2: Array[Byte] = Array[Int](
    0x42, 0x4D,             // "BM"
    0x46, 0, 0, 0,          // file size 70
    0, 0, 0, 0,             // reserved
    0x36, 0, 0, 0,          // pixel array offset 54
    0x28, 0, 0, 0,          // DIB header size 40
    2, 0, 0, 0,             // width 2
    2, 0, 0, 0,             // height 2 (bottom-up)
    1, 0,                   // planes
    24, 0,                  // bpp
    0, 0, 0, 0,             // BI_RGB
    0x10, 0, 0, 0,          // pixel array size 16
    0x13, 0x0B, 0, 0, 0x13, 0x0B, 0, 0, // 72 dpi
    0, 0, 0, 0, 0, 0, 0, 0, // palette counts
    // bottom row: red (BGR 00 00 FF), white (FF FF FF), pad
    0x00, 0x00, 0xFF, 0xFF, 0xFF, 0xFF, 0x00, 0x00,
    // top row: blue (FF 00 00), green (00 FF 00), pad
    0xFF, 0x00, 0x00, 0x00, 0xFF, 0x00, 0x00, 0x00
  ).map(_.toByte)

  test("BmpCodec decodes the canonical hand-written 2x2 BMP exactly") {
    val img = BmpCodec.decode(canonical2x2)
    assert(img.width == 2 && img.height == 2)
    // RGB, row-major, top-down
    val px = img.pixels.map(_ & 0xff).grouped(3).map {
      case Array(r, g, b) => (r, g, b) }.toSeq
    assert(px == Seq((0, 0, 255), (0, 255, 0), (255, 0, 0), (255, 255, 255)),
      s"decoded pixels: $px")
  }

  test("BmpCodec encode->decode round trips across every stride-padding residue") {
    for (w <- 1 to 9; h <- Seq(1, 3)) {
      def rgb(x: Int, y: Int) = ((x * 31 + y * 7) % 256, (x + y * 13) % 256, (x * y + 5) % 256)
      val img = BmpCodec.decode(BmpCodec.encode(w, h, rgb))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val got = (img.pixels(o) & 0xff, img.pixels(o + 1) & 0xff, img.pixels(o + 2) & 0xff)
        assert(got == rgb(x, y), s"pixel ($x,$y) of ${w}x$h: $got != ${rgb(x, y)}")
      }
    }
  }

  test("BmpCodec rejects non-BMP and unsupported variants loudly") {
    intercept[IllegalArgumentException](BmpCodec.decode("not a bitmap at all!!".getBytes ++ new Array[Byte](40)))
    val bpp8 = canonical2x2.clone; bpp8(28) = 8
    intercept[IllegalArgumentException](BmpCodec.decode(bpp8))
    val rle = canonical2x2.clone; rle(30) = 1
    intercept[IllegalArgumentException](BmpCodec.decode(rle))
    intercept[IllegalArgumentException](BmpCodec.decode(canonical2x2.take(60))) // truncated pixels
  }

  test("imageFeatures decodes a true BMP fixture FILE through Spark") {
    // a real file on disk, ingested via the binaryFile source — the
    // production ingest shape for media blobs
    val dir = java.nio.file.Files.createTempDirectory("bmp-fixture-")
    java.nio.file.Files.write(dir.resolve("fixture.bmp"), canonical2x2)
    val media = spark.read.format("binaryFile").load(dir.toString)
      .select(org.apache.spark.sql.functions.lit(7L).as("media_id"),
        $"content".as("media"))
    val f = Multimodal.imageFeatures(media, "media_id", "media").collect()(0)
    assert(f.width == 2 && f.height == 2)
    assert(f.sum_r == 255 + 255 && f.sum_g == 255 + 255 && f.sum_b == 255 + 255)
    // wsum_r = 1*R(0,0) + 2*R(1,0) + 3*R(0,1) + 4*R(1,1) = 0 + 0 + 765 + 1020
    assert(f.wsum_r == 3 * 255 + 4 * 255, s"wsum_r=${f.wsum_r}")
    assert(f.r_first == 0 && f.r_last == 255)
  }

  test("resizeNearest: identity at source dims, exact sampling on downscale") {
    val src = BmpCodec.decode(BmpCodec.encode(10, 8,
      (x, y) => (x * 20 + y, y * 25, (x * y) % 256)))
    val same = Multimodal.resizeNearest(src, 10, 8)
    assert(java.util.Arrays.equals(same.pixels, src.pixels), "identity resize")
    val thumb = Multimodal.resizeNearest(src, 4, 2)
    assert(thumb.width == 4 && thumb.height == 2)
    for (gy <- 0 until 2; gx <- 0 until 4) {
      val (sx, sy) = (gx * 10 / 4, gy * 8 / 2)
      val t = (gy * 4 + gx) * 3; val s = (sy * 10 + sx) * 3
      assert(thumb.pixels(t) == src.pixels(s) &&
        thumb.pixels(t + 1) == src.pixels(s + 1) &&
        thumb.pixels(t + 2) == src.pixels(s + 2),
        s"thumb($gx,$gy) != src($sx,$sy)")
    }
  }

  test("thumbnails: decode->resize->re-encode round trips through Spark") {
    val rows = Seq(
      (1L, BmpCodec.encode(12, 9, (x, y) => (x * 9, y * 11, 7))),
      (2L, PngCodec.encode(15, 10, (x, y) => (x + y, x * 5, y * 13)))
    ).toDF("media_id", "media")
    val got = Multimodal.thumbnails(rows, "media_id", "media", 8, 6)
      .as[(Long, Array[Byte])].collect().toMap
    for ((id, w, h, enc) <- Seq(
        (1L, 12, 9, "bmp"), (2L, 15, 10, "png"))) {
      val thumb = BmpCodec.decode(got(id))
      assert(thumb.width == 8 && thumb.height == 6, s"$enc thumb dims")
      val src = ImageCodec.decode(rows.filter($"media_id" === id)
        .head().getAs[Array[Byte]]("media"))
      val expect = Multimodal.resizeNearest(src, 8, 6)
      assert(java.util.Arrays.equals(thumb.pixels, expect.pixels),
        s"$enc thumb pixels")
    }
  }

  test("audioSegments: hand-computed runs, trailing partial frame dropped") {
    // clip 1: frames (spf=2): [loud 900+900] [quiet 1 1] [loud 500 600]
    //         [loud 700 700] [quiet 0 0] + trailing sample 9999 (partial,
    //         dropped) → segments [0,0] and [2,3]
    val s1 = Array[Short](900, 900, 1, 1, 500, 600, 700, 700, 0, 0, 9999)
    // clip 2: all quiet → no segments
    val s2 = Array[Short](1, -1, 0, 1)
    val media = Seq(
      (1L, WavCodec.encode(16000, 1, s1)),
      (2L, WavCodec.encode(16000, 1, s2))).toDF("media_id", "media")
    val got = Multimodal.audioSegments(media, "media_id", "media",
        spf = 2, threshold = 1000L)
      .orderBy("media_id", "seg_idx")
      .select("media_id", "seg_idx", "start_f", "end_f", "n_frames", "energy")
      .as[(Long, Int, Int, Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1, 0, 0, 1L, 1800L),
      (1L, 2, 2, 3, 2L, 2500L)))
  }

  test("Archiver writes exactly one json file per batch") {
    val landing = java.nio.file.Files.createTempDirectory("landing-").toString
    val batch = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val p1 = graft.sources.Archiver.archiveJson(batch, landing, "batch-0001")
    assert(p1.toFile.exists)
    val back = spark.read.json(landing)
    assert(back.count() == 2)
    assert(new java.io.File(landing).listFiles().count(_.getName.endsWith(".json")) == 1)
  }
}
