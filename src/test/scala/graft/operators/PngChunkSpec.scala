package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PNG chunk surgery: framing, metadata insertion, ancillary scrubbing. */
class PngChunkSpec extends AnyFunSuite {

  private def png(w: Int = 5, h: Int = 4): Array[Byte] =
    PngCodec.encode(w, h, (x, y) => (x * 40 % 256, y * 60 % 256, (x + y) * 30 % 256))

  test("JDK truecolor output is exactly IHDR/IDAT/IEND (the m16 oracle base)") {
    assert(PngCodec.chunks(png()).map(_._1) == Seq("IHDR", "IDAT", "IEND"))
  }

  test("withTextChunks splices after IHDR with valid framing and CRCs") {
    val dirty = PngCodec.withTextChunks(png(),
      Seq("Author" -> "someone", "GPS" -> "51.5,-0.1"))
    val cs = PngCodec.chunks(dirty)
    assert(cs.map(_._1) == Seq("IHDR", "tEXt", "tEXt", "IDAT", "IEND"))
    // tEXt data = keyword + NUL + value
    assert(cs(1)._2 == "Author".length + 1 + "someone".length)
    // the JDK reader validates chunk CRCs on the pixel path — a decode
    // succeeding proves the splice kept every critical chunk intact
    assert(PngCodec.decode(dirty).pixels.sameElements(PngCodec.decode(png()).pixels))
  }

  test("stripAncillary removes exactly the ancillary chunks, bytes accounted") {
    val clean = png()
    val entries = Seq("Comment" -> "k=v", "Software" -> "graft")
    val dirty = PngCodec.withTextChunks(clean, entries)
    val scrubbed = PngCodec.stripAncillary(dirty)
    assert(scrubbed.sameElements(clean), "scrub of splice-only metadata must " +
      "return the original bytes (critical chunks are never rewritten)")
    val overhead = entries.map { case (k, v) => 12 + k.length + 1 + v.length }.sum
    assert(dirty.length - scrubbed.length == overhead)
    // idempotent on a clean file
    assert(PngCodec.stripAncillary(clean).sameElements(clean))
  }

  test("chunk walk fails loudly on truncated input") {
    val dirty = PngCodec.withTextChunks(png(), Seq("a" -> "b"))
    val truncated = dirty.dropRight(3)
    intercept[IllegalArgumentException](PngCodec.chunks(truncated))
  }
}
