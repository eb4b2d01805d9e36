package graft.operators

/** Real in-JVM audio codec for 16-bit PCM WAV (RIFF/WAVE) — the audio leg of
  * the multimodal decode stage, no longer a stub for this format. Like BMP
  * ([[BmpCodec]]), canonical PCM WAV is self-contained little-endian byte
  * math (RIFF chunk framing, a 16-byte `fmt ` chunk, interleaved 16-bit
  * samples in a `data` chunk), so decode runs on executors with zero native
  * dependencies and every decoded sample is bit-exact — which lets the m06
  * oracle reproduce downstream features analytically from the
  * sample-generating functions (the m03/m04 technique).
  *
  * Format per the public RIFF/WAVE layout: bytes 0-3 "RIFF", 4-7 riff size,
  * 8-11 "WAVE", then a sequence of chunks `[4-byte id][4-byte size][payload,
  * padded to even length]`. `fmt ` payload: format tag (1 = PCM), channels,
  * sample rate, byte rate, block align, bits per sample. `data` payload:
  * interleaved little-endian signed 16-bit samples. Decode skips unknown
  * chunks (LIST/INFO/cue etc.) including their odd-length pad byte, the part
  * naive parsers get wrong.
  */
object WavCodec {

  /** Decoded audio: interleaved signed 16-bit samples (frame-major —
    * `samples(f * channels + c)`). */
  final case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode a 16-bit PCM WAV. Walks the chunk list, skipping anything that
    * is not `fmt ` or `data` (with RIFF's even-byte padding); throws on
    * anything that isn't uncompressed 16-bit PCM — loud beats silently
    * garbled audio. */
  def decode(bytes: Array[Byte]): DecodedAudio = {
    require(bytes.length >= 44, s"WAV too short: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF", "not a WAV: missing RIFF magic")
    require(tag(bytes, 8) == "WAVE", "not a WAV: missing WAVE form type")
    var off = 12
    var sampleRate = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"truncated chunk '$id': size $size at offset $off in ${bytes.length} bytes")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          val fmtTag = le16(bytes, off + 8)
          require(fmtTag == 1, s"unsupported format tag $fmtTag (only PCM)")
          channels = le16(bytes, off + 10)
          sampleRate = le32(bytes, off + 12)
          val bps = le16(bytes, off + 22)
          require(bps == 16, s"unsupported bits-per-sample $bps (only 16)")
          require(channels >= 1, s"bad channel count $channels")
        case "data" =>
          dataOff = off + 8
          dataLen = size
        case _ => () // LIST, INFO, cue, fact, ... — skip
      }
      off += 8 + size + (size & 1) // chunks are padded to even length
    }
    require(sampleRate > 0, "no fmt chunk found")
    require(dataOff >= 0, "no data chunk found")
    require(dataLen % 2 == 0, s"odd data length $dataLen for 16-bit samples")
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = le16(bytes, dataOff + 2 * i).toShort
      i += 1
    }
    DecodedAudio(sampleRate, channels, out)
  }

  /** Encode interleaved signed 16-bit samples as a canonical 44-byte-header
    * PCM WAV — a valid file any player opens; the fixture producer for m06
    * and the WavCodecSpec round trips. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels >= 1, s"bad params rate=$sampleRate ch=$channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    val dataLen = samples.length * 2
    val b = new Array[Byte](44 + dataLen)
    def putTag(o: Int, s: String): Unit = { var i = 0; while (i < 4) { b(o + i) = s.charAt(i).toByte; i += 1 } }
    def putLe16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def putLe32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    putTag(0, "RIFF"); putLe32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1)                 // PCM
    putLe16(22, channels)
    putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2) // byte rate
    putLe16(32, channels * 2)      // block align
    putLe16(34, 16)                // bits per sample
    putTag(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    b
  }
}
