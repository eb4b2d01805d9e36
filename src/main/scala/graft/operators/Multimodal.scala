package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media as opaque
  * `binary` columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * The Spark-side plumbing (schema, batch iteration, partitioning, output
  * shape) is real and tested. Decode is REAL for 24-bit BMP
  * ([[BmpCodec]] → [[imageFeatures]], oracle-verified by m03) and for PNG
  * via the JDK's `javax.imageio` ([[PngCodec]], oracle-verified by m05);
  * formats needing native libraries absent from this container (JPEG,
  * audio) keep the deterministic [[StubCodec]] stand-in behind the same
  * contract:
  * `Iterator[MediaRow] → Iterator[MediaFeatures]`, the
  * mapInPandas/mapPartitions batch shape that amortizes codec init per
  * partition, not per row.
  *
  * Scale notes: media bytes never pass through a shuffle here — features are
  * extracted in the scan stage and only the (small) feature rows move.
  * Partition sizing for 100 TB of media = `spark.sql.files.maxPartitionBytes`
  * on the parquet side; one partition ≈ one codec instance.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, media: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           byte_entropy: Double, thumb_bytes: Long,
                           n_frames: Int, frame_offsets: Seq[Long])

  /** Deterministic fake codec — byte-level stats standing in for real
    * decode/resize/frame-sample. Replace for production. */
  object StubCodec {
    /** "Decode + feature-extract": byte histogram entropy. */
    def entropy(bytes: Array[Byte]): Double = {
      if (bytes.isEmpty) return 0.0
      val hist = new Array[Long](256)
      bytes.foreach(b => hist(b & 0xff) += 1)
      val n = bytes.length.toDouble
      hist.foldLeft(0.0) { (acc, c) =>
        if (c == 0) acc else acc - (c / n) * math.log(c / n) / math.log(2)
      }
    }

    /** "Resize": proportional byte budget for a thumbnail-sized rendition. */
    def thumbSize(nBytes: Long, w: Int, h: Int, thumbW: Int = 64): Long =
      if (w <= 0 || h <= 0) 0L
      else math.max(1L, nBytes * thumbW * thumbW / (w.toLong * h.toLong))

    /** "Frame sampling": k evenly spaced byte offsets (video frame analog). */
    def frameOffsets(nBytes: Long, k: Int): Seq[Long] =
      if (nBytes == 0) Seq.empty
      else (0 until k).map(i => i * nBytes / k)
  }

  /** Batch feature extraction over media rows — the mapPartitions shape:
    * one codec "instance" per partition, iterator-to-iterator (no
    * materialization of a partition's media in memory at once). */
  def extractFeatures(media: Dataset[MediaRow], frames: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs initialize here, once per partition
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.media.length.toLong,
          StubCodec.entropy(r.media),
          StubCodec.thumbSize(r.media.length.toLong, r.width, r.height),
          frames, StubCodec.frameOffsets(r.media.length.toLong, frames))
      }
    }
  }

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           sum_r: Long, sum_g: Long, sum_b: Long,
                           wsum_r: Long, r_first: Int, r_last: Int)

  /** REAL decode path (no stub): parse each binary column value as an image
    * (BMP or PNG, magic-sniffed via [[ImageCodec.decode]]) and emit
    * per-channel integer stats. Same
    * mapPartitions batch shape as [[extractFeatures]] — bytes never leave
    * the scan stage, only the small feature rows move. The weighted sum
    * `wsum_r = Σ (x + w·y + 1)·R(x,y)` is geometry-sensitive: a decoder bug
    * in row order, BGR order, or stride padding changes it even when the
    * plain sums survive (m03's oracle computes it analytically). */
  def imageFeatures(media: DataFrame, idCol: String, mediaCol: String): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = ImageCodec.decode(bytes)
          val px = img.pixels
          var sr = 0L; var sg = 0L; var sb = 0L; var wr = 0L
          var y = 0
          while (y < img.height) {
            var x = 0
            while (x < img.width) {
              val o = (y * img.width + x) * 3
              val r = px(o) & 0xff
              sr += r; sg += px(o + 1) & 0xff; sb += px(o + 2) & 0xff
              wr += (x + img.width.toLong * y + 1) * r
              x += 1
            }
            y += 1
          }
          ImageFeatures(id, img.width, img.height, sr, sg, sb, wr,
            px(0) & 0xff, px((img.width * img.height - 1) * 3) & 0xff)
        }
      }
  }

  case class ImageQuality(media_id: Long, width: Int, height: Int,
                          n_pixels: Int, min_lum: Int, max_lum: Int,
                          contrast: Int, n_distinct_lum: Int, keep: Boolean)

  /** IMAGE QUALITY GATE — the LAION-style curation filter for image
    * corpora: drop images too small (`n_pixels < minPixels`) or too flat
    * (`max−min` summed-channel luminance below `minContrast` — solid
    * colors, blank frames, single-color placeholders). All stats are exact
    * integers over the decoded pixels (luminance = r+g+b, no division), so
    * the gate is engine-portable; same mapPartitions batch shape as
    * [[imageFeatures]] — media bytes never leave the scan stage, only the
    * per-image stat row moves. `n_distinct_lum` (a 766-slot bitset per
    * image) is the cheap palette-collapse signal (dithered/quantized
    * placeholder detection). */
  def imageQuality(media: DataFrame, idCol: String, mediaCol: String,
                   minPixels: Int = 16, minContrast: Int = 30)
      : Dataset[ImageQuality] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = ImageCodec.decode(bytes)
          val px = img.pixels
          val n = img.width * img.height
          // a zero-pixel decode (0-width/height container) would leave the
          // sentinels in place and emit contrast = MinValue-MaxValue (wraps
          // to 1) — emit honest zeros and fail the gate instead
          if (n == 0) ImageQuality(id, img.width, img.height, 0, 0, 0, 0, 0,
            keep = false)
          else {
            var mn = Int.MaxValue; var mx = Int.MinValue
            val seen = new java.util.BitSet(766)
            var i = 0
            while (i < n) {
              val o = i * 3
              val lum = (px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)
              if (lum < mn) mn = lum
              if (lum > mx) mx = lum
              seen.set(lum)
              i += 1
            }
            ImageQuality(id, img.width, img.height, n, mn, mx, mx - mn,
              seen.cardinality(), n >= minPixels && (mx - mn) >= minContrast)
          }
        }
      }
  }

  case class FrameStats(media_id: Long, frame: Int, min_lum: Int,
                        max_lum: Int, contrast: Int, keep: Boolean)

  /** VIDEO FRAME SAMPLING + per-frame quality gate — the "frame-sample"
    * verb of a multimodal training pipeline: decode the container once,
    * keep every `every`-th frame, and gate each sampled frame on the m13
    * contrast rule (drops black/blank/solid frames — the placeholder
    * class video curation removes before captioning). Stats are exact
    * integers over decoded pixels; media bytes never leave the scan
    * stage — only (media_id, frame, stats) rows move, `nFrames/every`
    * per video regardless of resolution. */
  def videoFrameSample(media: DataFrame, idCol: String, mediaCol: String,
                       every: Int, minContrast: Int = 30)
      : Dataset[FrameStats] = {
    require(every > 0, s"bad sampling stride $every")
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val vid = AviCodec.decode(bytes)
        vid.frames.iterator.zipWithIndex
          .filter(_._2 % every == 0)
          .map { case (img, f) =>
            val px = img.pixels
            val n = img.width * img.height
            if (n == 0) FrameStats(id, f, 0, 0, 0, keep = false)
            else {
              var mn = Int.MaxValue; var mx = Int.MinValue
              var i = 0
              while (i < n) {
                val o = i * 3
                val lum = (px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)
                if (lum < mn) mn = lum
                if (lum > mx) mx = lum
                i += 1
              }
              FrameStats(id, f, mn, mx, mx - mn, (mx - mn) >= minContrast)
            }
          }.toSeq
      }
  }

  /** Nearest-neighbor resize of a decoded image — the dHash sampling rule
    * (`sx = gx·w/W`, integer division) applied to every output pixel, so a
    * resize is exact integer math an oracle can reproduce from the source
    * pixel functions. */
  def resizeNearest(img: BmpCodec.DecodedImage, outW: Int, outH: Int): BmpCodec.DecodedImage = {
    require(outW > 0 && outH > 0, s"bad thumb dims ${outW}x$outH")
    val out = new Array[Byte](outW * outH * 3)
    var gy = 0
    while (gy < outH) {
      val sy = gy * img.height / outH
      var gx = 0
      while (gx < outW) {
        val sx = gx * img.width / outW
        val s = (sy * img.width + sx) * 3
        val d = (gy * outW + gx) * 3
        out(d) = img.pixels(s); out(d + 1) = img.pixels(s + 1); out(d + 2) = img.pixels(s + 2)
        gx += 1
      }
      gy += 1
    }
    BmpCodec.DecodedImage(outW, outH, out)
  }

  /** Thumbnail generation — the multimodal RESIZE stage: decode each binary
    * image (format-sniffed), nearest-neighbor resize to `outW`×`outH`,
    * re-encode as BMP. Same mapPartitions batch shape as [[imageFeatures]];
    * at 100 TB only (id, thumb) rows leave the scan stage — a thumbnail is
    * a few hundred bytes against megapixel sources, so this is the
    * columnar-media analog of column pruning. The re-encode round trip is
    * intentional: m08's oracle reads features from decode(encode(resize(
    * decode(...)))) — bit-exactness across the full chain, not just the
    * sampler. */
  def thumbnails(media: DataFrame, idCol: String, mediaCol: String,
                 outW: Int, outH: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val thumb = resizeNearest(ImageCodec.decode(bytes), outW, outH)
          (id, BmpCodec.encode(thumb.width, thumb.height, (x, y) => {
            val o = (y * thumb.width + x) * 3
            ((thumb.pixels(o) & 0xff, thumb.pixels(o + 1) & 0xff, thumb.pixels(o + 2) & 0xff))
          }))
        }
      }.toDF(idCol, "thumb")
  }

  /** Voice-activity (silence) segmentation over a binary WAV column — the
    * speech-curation primitive: maximal runs of frames whose Σ|sample|
    * energy exceeds `threshold`, at `spf` samples per frame. The native
    * [[graft.functions.AudioFrameEnergiesExpr]] reduces each clip to its
    * frames×8-byte profile INSIDE the scan stage (media bytes never
    * shuffle); activity thresholding and the gaps-and-islands run grouping
    * are RELATIONAL (filter + `f − row_number()` + group-agg), so the
    * detector policy stays visible and swappable in the plan — the m10
    * scene-cut design applied to audio. Output: one row per segment with
    * 0-based inclusive frame bounds, 1-based seg_idx ordered by start, and
    * the exact-integer segment energy. */
  def audioSegments(media: DataFrame, idCol: String, mediaCol: String,
                    spf: Int, threshold: Long): DataFrame = {
    graft.functions.FrameEnergy.registerNative(media.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val frames = media.select(col(idCol).as("media_id"),
        posexplode(graft.functions.FrameEnergy.audioFrameEnergies(
          col(mediaCol), spf)).as(Seq("f", "en")))
      .filter(col("en") > threshold)
    val w = Window.partitionBy(col("media_id")).orderBy(col("f"))
    frames
      .withColumn("grp", col("f") - row_number().over(w))
      .groupBy(col("media_id"), col("grp"))
      .agg(min(col("f")).as("start_f"), max(col("f")).as("end_f"),
        count(lit(1)).as("n_frames"), sum(col("en")).as("energy"))
      .withColumn("seg_idx", row_number().over(
        Window.partitionBy(col("media_id")).orderBy(col("start_f"))))
      .select(col("media_id"), col("seg_idx"), col("start_f"), col("end_f"),
        col("n_frames"), col("energy"))
  }

  case class AudioQuality(media_id: Long, n_samples: Int, n_clipped: Long,
                          n_frames: Int, n_silent: Long,
                          silence_ratio: Double, keep: Boolean)

  /** AUDIO QUALITY GATE — the speech-corpus curation cut: drop tracks with
    * CLIPPED samples (|s| at the int16 rail — irrecoverable distortion) or
    * mostly-silent content (fraction of `spf`-sample frames whose
    * abs-energy ≤ `silenceThreshold` above `maxSilence`). One decode pass
    * per track in the scan stage (the m13/m14 shape — audio bytes never
    * leave it); counts are exact integers, the ratio one int/int IEEE
    * division. */
  def audioQuality(media: DataFrame, idCol: String, mediaCol: String,
                   spf: Int, silenceThreshold: Long,
                   maxSilence: Double = 0.5): Dataset[AudioQuality] = {
    require(spf > 0, s"bad samples-per-frame $spf")
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val a = WavCodec.decode(bytes)
          val s = a.samples
          var clipped = 0L
          var i = 0
          while (i < s.length) {
            if (s(i) == Short.MaxValue || s(i) == Short.MinValue) clipped += 1
            i += 1
          }
          val nFrames = s.length / spf
          var silent = 0L
          var f = 0
          while (f < nFrames) {
            var en = 0L
            var j = 0
            while (j < spf) { en += math.abs(s(f * spf + j).toLong); j += 1 }
            if (en <= silenceThreshold) silent += 1
            f += 1
          }
          val ratio =
            if (nFrames == 0) 0.0 else silent.toDouble / nFrames
          AudioQuality(id, s.length, clipped, nFrames, silent, ratio,
            clipped == 0 && ratio <= maxSilence)
        }
      }
  }

  /** Build a media table from the documents table (text bytes as the opaque
    * payload) — gives the multimodal path a deterministic, testdata-backed
    * input without shipping binary fixtures. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        col("text").cast("binary").as("media"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRow]
  }
}
