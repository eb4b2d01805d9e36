package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.unsafe.types.UTF8String

/** Pins the content-defined-chunking contract behind d23: boundaries are
  * functions of content (so shared substrings chunk identically in any
  * context once they span an anchor), spans tile the normalized text
  * exactly, and the span operator finds planted duplicate passages without
  * pairing unrelated docs. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, w: Int = 8): Seq[(Int, Int, String)] = {
    val arr = CdcChunksExpr.compute(UTF8String.fromString(text), w)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
    }
  }

  // deterministic pseudo-random word soup (no java.util.Random — explicit LCG)
  private def words(seed: Long, n: Int): String = {
    var s = seed
    (0 until n).map { _ =>
      s = (s * 6364136223846793005L + 1442695040888963407L)
      "w" + math.floorMod(s >>> 33, 31)
    }.mkString(" ")
  }

  test("chunks tile the normalized text: contiguous, full cover, hashes match") {
    for (seed <- 1L to 10L) {
      val text = "  " + words(seed, 40).toUpperCase + "\t\n"
      val norm = text.toLowerCase.replaceAll("[ \\t\\n\\f\\r]+", " ").trim
      val cs = chunksOf(text)
      assert(cs.head._1 == 0 && cs.map(c => c._1 + c._2).max == norm.length)
      cs.sliding(2).foreach {
        case Seq(a, b) => assert(a._1 + a._2 == b._1, s"gap between $a and $b")
        case _ => ()
      }
      cs.foreach { case (st, len, h) =>
        assert(h == Md5.hex(norm.substring(st, st + len)))
      }
    }
  }

  test("a shared substring spanning anchors chunks identically in different contexts") {
    val shared = words(99L, 30) // long enough to contain several anchors
    val a = words(1L, 15) + " " + shared + " " + words(2L, 15)
    val b = words(3L, 4) + " " + shared + " " + words(4L, 22)
    val ha = chunksOf(a).map(_._3).toSet
    val hb = chunksOf(b).map(_._3).toSet
    val common = ha intersect hb
    // interior chunks of the shared region (those not cut by context at the
    // edges) must coincide — with ~112 gram starts at p=1/16 the shared
    // region contains anchors with near-certainty
    assert(common.nonEmpty, "no common chunk for a 30-word shared passage")
  }

  test("short and empty inputs: single chunk below gram width, none when empty") {
    assert(chunksOf("") == Seq.empty)
    assert(chunksOf("   \t ") == Seq.empty)
    val single = chunksOf("abc") // shorter than w=8
    assert(single == Seq((0, 3, Md5.hex("abc"))))
  }

  test("removeDuplicatedPassages keeps exactly one occurrence, rebuild is exact") {
    val passage = words(7L, 25)
    val docs = Seq(
      (0L, words(10L, 20) + " " + passage),
      (1L, passage + " " + words(11L, 20)),
      (2L, words(12L, 40))
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedPassages(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .select($"doc_id", $"clean_md5", $"clean_chars", $"n_cut", $"cut_chars")
      .as[(Long, String, Long, Long, Long)].collect()
    // doc 0 wins every shared chunk (smallest doc_id): nothing cut, md5 of
    // its full normalized text
    val norm0 = (words(10L, 20) + " " + passage).toLowerCase
      .replaceAll("[ \\t\\n\\f\\r]+", " ").trim
    assert(got(0)._2 == Md5.hex(norm0) && got(0)._4 == 0L)
    assert(got(0)._3 == norm0.length)
    // doc 1 loses the shared interior chunks: something cut, length reduced
    // by exactly cut_chars
    val norm1 = (passage + " " + words(11L, 20)).toLowerCase
      .replaceAll("[ \\t\\n\\f\\r]+", " ").trim
    assert(got(1)._4 > 0L, "no passage cut from doc 1")
    assert(got(1)._3 == norm1.length - got(1)._5)
    // unrelated doc untouched
    assert(got(2)._4 == 0L && got(2)._5 == 0L)
  }

  test("exactSubstringSpans finds a planted duplicated passage, no false pairs") {
    val passage = words(7L, 25)
    val docs = Seq(
      (0L, words(10L, 20) + " " + passage),
      (1L, passage + " " + words(11L, 20)),
      (2L, words(12L, 40)), // unrelated
      (3L, words(13L, 3))   // tiny
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(docs, "doc_id", "text")
      .select($"doc_id", $"n_docs").as[(Long, Long)].collect()
    val docsWithDups = spans.map(_._1).toSet
    assert(docsWithDups.contains(0L) && docsWithDups.contains(1L),
      s"planted passage not found: $docsWithDups")
    assert(!docsWithDups.contains(2L) && !docsWithDups.contains(3L),
      s"false duplicate spans: $docsWithDups")
    spans.foreach { case (_, nDocs) => assert(nDocs == 2L) }
  }
}
