package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Pins the dedup/fingerprint ladder's behavior OUTSIDE the pure-ASCII
  * testdata envelope: accented Latin, CJK, and emoji (supplementary-plane)
  * text. What is promised: Spark-side SELF-CONSISTENCY — the native
  * codegen'd expressions agree with the HOF/regex compositions they
  * replaced, normalization is stable across whitespace/punctuation
  * variants, and non-Latin scripts are neither collapsed nor mangled.
  *
  * What is NOT promised (and why there is no oracle row over this corpus):
  * DuckDB parity of non-ASCII case mapping — JDK `toLowerCase(ROOT)` and
  * DuckDB `lower()` may disagree on exotic mappings (U+0130 İ, ß, final
  * sigma). `\p{Punct}` (Java) ≡ `[[:punct:]]` (RE2) stays safe on any
  * input because BOTH are ASCII-only classes — non-ASCII punctuation
  * (U+3002 。 etc.) passes through unchanged on both engines. CLAUDE.md
  * rule 4 records this envelope.
  */
class NonAsciiNormalizationSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "Héllo wörld, naïve café!",
    "héllo wörld naïve café",    // = above after lower + ASCII-punct strip
    "的是了在我有和不",
    "これはテストです。",          // ideographic full stop is NOT ASCII punct
    "これはテストです",
    "🚀 emoji 🎉 test données",
    "İstanbul ŞEHİR",
    "mixed 中文 and english")

  test("native expressions agree with their HOF/regex compositions beyond ASCII") {
    TextFunctions.registerNative(spark)
    val df = corpus.toDF("text")
    val fp = df.select(
      TextFunctions.fingerprintNative($"text").as("native"),
      TextFunctions.fingerprint($"text").as("composed")).collect()
    assert(fp.forall(r => r.getString(0) == r.getString(1)),
      "content_fingerprint: native != composed on non-ASCII")
    val sh = df.select(
      TextFunctions.wordShinglesNative($"text", 2).as("native"),
      TextFunctions.wordShingles($"text", 2).as("composed")).collect()
    assert(sh.forall(r => r.getSeq[String](0) == r.getSeq[String](1)),
      "word_shingles: native != composed on non-ASCII")
  }

  test("ASCII punctuation strips around non-ASCII letters; scripts survive") {
    TextFunctions.registerNative(spark)
    val fps = corpus.toDF("text")
      .select(TextFunctions.fingerprintNative($"text")).as[String].collect()
    // rows 0 and 1 differ only by ASCII punctuation + case → same key
    assert(fps(0) == fps(1))
    // CJK text does NOT collapse to the empty fingerprint
    val emptyFp = Seq("").toDF("text")
      .select(TextFunctions.fingerprintNative($"text")).as[String].first()
    assert(fps(2) != emptyFp && fps(3) != emptyFp)
    // ideographic full stop U+3002 is not ASCII punct → NOT stripped
    assert(fps(3) != fps(4))
    // all distinct texts (post-normalization) get distinct keys
    assert(fps.distinct.length == fps.length - 1) // only the 0/1 pair merges
  }

  test("accents are significant: no diacritic folding in the dedup key") {
    TextFunctions.registerNative(spark)
    val fps = Seq("café", "cafe", "naïve", "naive").toDF("text")
      .select(TextFunctions.fingerprintNative($"text")).as[String].collect()
    assert(fps.distinct.length == 4)
  }

  test("winnowing: whitespace variants collapse identically on non-ASCII text") {
    TextFunctions.registerNative(spark)
    val variants = Seq(
      "héllo  wörld\tdonnées\nfin",   // runs of space/tab/newline
      "héllo wörld données fin")
    val fps = variants.toDF("text")
      .select(TextFunctions.winnowFingerprints($"text", k = 4, w = 2))
      .as[Seq[String]].collect()
    assert(fps(0) == fps(1), "\\s-run collapse must be byte-identical")
    assert(fps(0).nonEmpty)
    // CJK: char k-grams work on code points, deterministic across calls
    val cjk = Seq("的是了在我有和不的是了在我有和不").toDF("text")
      .select(TextFunctions.winnowFingerprints($"text", k = 4, w = 2))
      .as[Seq[String]].collect()
    assert(cjk(0).nonEmpty && cjk(0) == cjk(0).distinct)
  }

  test("emoji (surrogate pairs) survive tokenize → shingle → simhash intact") {
    TextFunctions.registerNative(spark)
    val toks = Seq("🚀 emoji 🎉 test").toDF("text")
      .select(TextFunctions.tokens($"text")).as[Seq[String]].first()
    assert(toks == Seq("🚀", "emoji", "🎉", "test"))
    val docs = Seq(
      (1L, "🚀 emoji 🎉 test données"),
      (2L, "🚀 emoji 🎉 test données"),  // exact dup
      (3L, "🚀 emoji 🎉 best données")   // one word off
    ).toDF("doc_id", "text")
    val sh = Dedup.simhashFeatures(
      Dedup.docShingles(docs, "doc_id", "text", n = 2), "shingle", bits = 16)
      .orderBy($"doc_id").as[(Long, Long)].collect()
    assert(sh(0)._2 == sh(1)._2, "identical emoji docs must hash equal")
    assert(sh(0)._2 != sh(2)._2, "different docs must not collapse")
  }

  test("char shingles slice by codepoint: surrogate pairs never split") {
    import org.apache.spark.unsafe.types.UTF8String
    // "🚀a🎉b" = 4 codepoints → 3 distinct char-2-grams, each a valid string
    val grams = CharShinglesExpr.compute(UTF8String.fromString("🚀a🎉b"), 2)
    val strs = (0 until grams.numElements()).map(i => grams.getUTF8String(i).toString)
    assert(strs == Seq("🚀a", "a🎉", "🎉b"))
    strs.foreach { g =>
      assert(g.codePointCount(0, g.length) == 2, s"gram '$g' is not 2 codepoints")
      assert(!g.exists(c => Character.isSurrogate(c) &&
        (g.indexOf(c) == 0 && Character.isLowSurrogate(c) ||
         g.indexOf(c) == g.length - 1 && Character.isHighSurrogate(c))),
        s"gram '$g' contains a broken surrogate half")
    }
    // ASCII behavior unchanged: same grams as naive char slicing
    val ascii = CharShinglesExpr.compute(UTF8String.fromString("abcab"), 3)
    assert((0 until ascii.numElements()).map(i => ascii.getUTF8String(i).toString)
      == Seq("abc", "bca", "cab"))
  }

  test("NFC: decomposed sequences compose; ASCII is identity (zero-copy); fixpoint holds") {
    TextFunctions.registerNative(spark)
    val decomposedE = "e\u0301"             // e + COMBINING ACUTE
    val composedE = "\u00e9"                 // é precomposed
    val cases = Seq(
      s"caf$decomposedE",                         // composes to café
      s"caf$composedE",                           // already NFC
      "plain ascii text",                         // identity fast path
      s"A$decomposedE${decomposedE}B",            // stacked combining marks
      "d\u0307\u0323")                    // dot-above then dot-below: NFC reorders (ccc 230>220) then composes d+dot-below
    val out = cases.toDF("t")
      .select(TextFunctions.nfcNormalize($"t").as("n")).as[String].collect()
    assert(out(0) == s"caf$composedE")
    assert(out(1) == s"caf$composedE")
    assert(out(2) == "plain ascii text")
    // every output is a fixpoint and matches the JDK reference directly
    cases.zip(out).foreach { case (in, o) =>
      assert(o == java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC))
      assert(java.text.Normalizer.isNormalized(o, java.text.Normalizer.Form.NFC))
    }
    // dedup integration: composed and decomposed renditions fingerprint
    // identically AFTER nfc, differently before — the reason the op exists
    val pair = Seq((1L, s"caf$decomposedE"), (2L, s"caf$composedE")).toDF("doc_id", "text")
    val pre = pair.select(md5($"text")).distinct().count()
    val post = pair.select(md5(TextFunctions.nfcNormalize($"text"))).distinct().count()
    assert(pre == 2 && post == 1)
  }

  test("exact dedup over a mixed-script corpus keys only true duplicates") {
    val docs = Seq(
      (1L, "的是了在我有和不"),
      (2L, "的是了在我有和不"),          // exact CJK dup
      (3L, "Héllo wörld, naïve café!"),
      (4L, "héllo wörld naïve café"),   // dup modulo ASCII punct + case
      (5L, "İstanbul ŞEHİR")
    ).toDF("doc_id", "text")
    val clusters = Dedup.exact(docs, "doc_id", "text")
      .orderBy($"keep_id").as[(String, Long, Long)].collect()
    assert(clusters.map(c => (c._2, c._3)).toSeq ==
      Seq((1L, 2L), (3L, 2L), (5L, 1L)))
  }
}
