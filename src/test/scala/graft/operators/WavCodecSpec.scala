package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the PCM WAV codec contract behind m06: bit-exact round trips across
  * the full 16-bit range, chunk-walking decode (unknown chunks skipped,
  * including RIFF's odd-length pad byte), stereo interleave, and loud
  * rejection of anything that isn't 16-bit PCM. */
class WavCodecSpec extends AnyFunSuite {

  private def samples(n: Int, f: Int => Int): Array[Short] =
    Array.tabulate(n)(i => f(i).toShort)

  test("encode/decode round trip is bit-exact, extremes included") {
    val s = samples(301, i => ((i * 7919 + 13) % 65536) - 32768) // full range
    s(0) = Short.MinValue; s(1) = Short.MaxValue; s(2) = 0
    val dec = WavCodec.decode(WavCodec.encode(16000, 1, s))
    assert(dec.sampleRate == 16000 && dec.channels == 1)
    assert(java.util.Arrays.equals(dec.samples, s))
  }

  test("stereo round trip preserves interleave and channel count") {
    val s = samples(200, i => (i * 31 - 3000))
    val dec = WavCodec.decode(WavCodec.encode(44100, 2, s))
    assert(dec.channels == 2 && dec.sampleRate == 44100)
    assert(java.util.Arrays.equals(dec.samples, s))
  }

  test("decode skips unknown chunks, including the odd-length pad byte") {
    val s = samples(57, i => i * 100 - 2800)
    val wav = WavCodec.encode(8000, 1, s)
    // splice a 5-byte (odd!) junk chunk between "fmt " and "data":
    // bytes 0..35 = RIFF header + fmt chunk, 36.. = data chunk
    val junkPayload = Array[Byte](1, 2, 3, 4, 5)
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ junkPayload ++ Array[Byte](0) // pad to even
    val spliced = wav.take(36) ++ junk ++ wav.drop(36)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val riffSize = spliced.length - 8
    spliced(4) = riffSize.toByte; spliced(5) = (riffSize >> 8).toByte
    spliced(6) = (riffSize >> 16).toByte; spliced(7) = (riffSize >> 24).toByte
    val dec = WavCodec.decode(spliced)
    assert(dec.sampleRate == 8000)
    assert(java.util.Arrays.equals(dec.samples, s))
  }

  test("rejects non-PCM, non-16-bit, and non-WAV inputs loudly") {
    val good = WavCodec.encode(16000, 1, samples(57, _ => 1))
    val nonPcm = good.clone(); nonPcm(20) = 3 // format tag = IEEE float
    intercept[IllegalArgumentException](WavCodec.decode(nonPcm))
    val wrongBits = good.clone(); wrongBits(34) = 8
    intercept[IllegalArgumentException](WavCodec.decode(wrongBits))
    intercept[IllegalArgumentException](WavCodec.decode("nota wav".getBytes))
    intercept[IllegalArgumentException](
      WavCodec.decode(BmpCodec.encode(4, 4, (_, _) => (1, 2, 3))))
  }

  test("encoded header fields are canonical PCM (playable file shape)") {
    val wav = WavCodec.encode(16000, 1, samples(10, _ => 0))
    assert(wav.length == 44 + 20)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
    assert(new String(wav, 12, 4, "US-ASCII") == "fmt ")
    assert(new String(wav, 36, 4, "US-ASCII") == "data")
    assert((wav(28) & 0xff | (wav(29) & 0xff) << 8) == (16000 * 2 & 0xffff)) // byte rate lo16
  }
}
