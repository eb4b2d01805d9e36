package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM training-data pipelines — pure
  * `org.apache.spark.sql.functions` compositions (codegen'd, no UDFs), so
  * every operator stays inside whole-stage codegen and scales columnar.
  *
  * These extend the reference's capability surface (it has no text ops —
  * SURVEY.md §2.9) with the standard pretraining-corpus operators:
  * tokenization, quality scoring, language ID, fingerprinting, shingling.
  */
object TextFunctions {

  /** Whitespace tokens (empty-safe). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, single digits, single punctuation —
    * a cheap proxy for subword tokenizers (regex kept RE2/Java-compatible
    * for oracle parity). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  private val BpeName = "bpe_encode"
  private val BpeWithName = "bpe_encode_with"
  private val ShinglesName = "word_shingles"
  private val CharShinglesName = "char_shingles"
  private val WinnowName = "winnow_fps"
  private val FingerprintName = "content_fingerprint"
  private val NfcName = "nfc_normalize"

  /** Idempotently register the native expressions ([[WordShinglesExpr]],
    * [[WinnowingExpr]], [[FingerprintExpr]]) in the session's function
    * registry (same pattern as [[VectorFunctions.register]]). */
  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShinglesName,
      exprs => WordShinglesExpr(exprs(0), exprs(1).eval().asInstanceOf[Int]),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      WinnowName,
      exprs => WinnowingExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FingerprintName, exprs => FingerprintExpr(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CharShinglesName,
      exprs => CharShinglesExpr(exprs(0), exprs(1).eval().asInstanceOf[Int]),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NfcName, exprs => NfcNormalizeExpr(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BpeName, exprs => BpeEncodeExpr(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BpeWithName, exprs => {
        require(exprs.length == 2,
          s"$BpeWithName(text, merges) takes exactly 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable,
          s"$BpeWithName's second argument must be a LITERAL array of " +
            "\"left right\" merge strings (the table ships with the plan)")
        val arr = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val pairs = (0 until arr.numElements()).map { i =>
          val s = arr.getUTF8String(i).toString
          val j = s.indexOf(' ') // pre-tokens never contain whitespace
          require(j > 0 && j < s.length - 1,
            s"""malformed merge entry "$s" — expected "left right"""")
          (s.substring(0, j), s.substring(j + 1))
        }.toIndexedSeq
        BpeEncodeWithExpr(exprs(0), new BpeTable(pairs))
      }, "built-in")
  }

  /** True BPE subword stream over the frozen [[BpeMerges]] table (native
    * [[BpeEncodeExpr]]); call [[registerNative]] first. `bpeTokenCount`
    * remains the cheap regex PROXY — this is the real tokenizer the packing
    * (d16) and mixing (d26) budgets model. */
  def bpeTokens(text: Column): Column = call_function(BpeName, text)

  /** BPE subword stream over a CALLER-SUPPLIED merge table (native
    * [[BpeEncodeWithExpr]] — the deployable retrained/pruned-tokenizer
    * path, d58); call [[registerNative]] first. The table ships as a
    * `"left right"` string-array literal. */
  def bpeTokensWith(text: Column, pairs: Seq[(String, String)]): Column =
    call_function(BpeWithName, text,
      typedlit(pairs.map { case (a, b) => s"$a $b" }))

  /** Native Unicode NFC normalization ([[NfcNormalizeExpr]]); call
    * [[registerNative]] first. */
  def nfcNormalize(text: Column): Column = call_function(NfcName, text)

  /** Native distinct char n-grams over normalized text ([[CharShinglesExpr]]);
    * call [[registerNative]] first. */
  def charShinglesNative(text: Column, n: Int): Column =
    call_function(CharShinglesName, text, lit(n))

  /** Native single-pass fingerprint — semantics identical to
    * [[fingerprint]]; call [[registerNative]] first. */
  def fingerprintNative(text: Column): Column =
    call_function(FingerprintName, text)

  /** Winnowing (rolling-hash) document fingerprints — call
    * [[registerNative]] first; see [[WinnowingExpr]]. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    call_function(WinnowName, text, lit(k), lit(w))

  /** Native codegen'd shingling — semantics identical to [[wordShingles]],
    * one tight JVM loop per row instead of an interpreted HOF chain. Call
    * [[registerNative]] first. */
  def wordShinglesNative(text: Column, n: Int): Column =
    call_function(ShinglesName, text, lit(n))

  /** Distinct word n-gram shingles, space-joined. Empty when < n tokens.
    * Built by zipping n shifted views of the token array (one pass, no
    * per-element index arithmetic) — ~5x faster than an indexed
    * `transform(sequence(...), i -> slice(...))`, but still interpreted per
    * row (HOFs sit outside codegen); the dedup hot path uses
    * [[wordShinglesNative]]. */
  def wordShingles(text: Column, n: Int): Column = {
    require(n >= 2, "use tokens() for 1-grams")
    val w = tokens(text)
    val m = size(w) - (n - 1)
    val grams = (1 until n).foldLeft(slice(w, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(w, lit(j + 1), m), (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(
      when(size(w) < n, array().cast("array<string>")).otherwise(grams))
  }

  /** Character-class ratios over the raw text (length-0 guarded). */
  def charRatio(text: Column, charClassRe: String): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise((length(text) - length(regexp_replace(text, charClassRe, "")))
        .cast("double") / length(text))

  /** Fraction of characters that are ASCII letters. */
  def alphaRatio(text: Column): Column = charRatio(text, "[A-Za-z]")

  /** Fraction of characters that are punctuation (non-alnum, non-space). */
  def punctRatio(text: Column): Column = charRatio(text, "[^A-Za-z0-9\\s]")

  /** Mean token length (0 for empty). */
  def avgWordLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
  }

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that")

  /** Fraction of tokens that are stopwords (frequency-weighted). */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, x => x.isin(stopwords: _*))).cast("double") / size(t))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and sane
    * token lengths, penalizes punctuation soup — the classic cheap
    * pretraining-quality heuristic. */
  def qualityScore(text: Column): Column = {
    val sw = stopwordRatio(text)
    val pr = punctRatio(text)
    val awl = avgWordLen(text)
    val lenOk = when(tokenCount(text).between(5, 100000), lit(1.0)).otherwise(lit(0.0))
    val wordOk = when(awl.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    (least(sw * 4.0, lit(1.0)) + (lit(1.0) - least(pr * 5.0, lit(1.0))) + lenOk + wordOk) / 4.0
  }

  /** Repetition ratio: fraction of n-gram occurrences that are repeats of an
    * earlier n-gram in the same document (0 = no repetition). The classic
    * Gopher-style quality signal — high values flag boilerplate/spam. n=1
    * gives duplicate-word ratio. */
  def repetitionRatio(text: Column, n: Int): Column = {
    val w = tokens(text)
    val grams = if (n == 1) w else {
      val m = size(w) - (n - 1)
      val zipped = (1 until n).foldLeft(slice(w, lit(1), m)) { (acc, j) =>
        zip_with(acc, slice(w, lit(j + 1), m), (a, b) => concat(a, lit(" "), b))
      }
      // guard BEFORE sizing: slice with non-positive length errors, and
      // when/otherwise short-circuits per row
      when(size(w) < n, array().cast("array<string>")).otherwise(zipped)
    }
    when(size(grams) === 0, lit(0.0))
      .otherwise((size(grams) - size(array_distinct(grams))).cast("double") / size(grams))
  }

  /** Language-marker word lists for the 5 testdata languages. Deliberately
    * tiny — the operator shape (argmax of per-language hit counts) is the
    * point; swap in real frequency tables for production. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "es" -> Seq("el", "la", "los", "las", "y", "que", "de", "un"),
    "fr" -> Seq("le", "la", "les", "et", "que", "des", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Distinct-marker hit count for one language. */
  def langScore(text: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(array_intersect(array_distinct(tokens(lower(text))),
      array(markers.map(lit): _*)))
  }

  /** n-gram-heuristic language ID: argmax of marker hits, ties resolved to
    * the alphabetically first language (chained-when in alphabetical order —
    * mirrors the oracle CASE exactly). */
  def langId(text: Column): Column = {
    val langs = langMarkers.map(_._1) // already alphabetical
    val scores = langs.map(l => l -> langScore(text, l)).toMap
    langs.foldLeft(when(lit(false), lit("und"))) { (acc, l) =>
      acc.when(langs.filter(_ != l).map(o => scores(l) >= scores(o)).reduce(_ && _), lit(l))
    }.otherwise(lit("und"))
  }

  /** PII scrubbing for training corpora: replace email addresses, long
    * digit runs (phone/account numbers), and IPv4 addresses with typed
    * placeholder tokens. Regexes are RE2/Java-compatible (no lookarounds)
    * so the operator is engine-portable and oracle-checkable. Order
    * matters: emails first (they contain digit runs), then IPs (dotted
    * digits), then bare digit runs. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val numberRunRe = "[0-9][0-9 ().-]{6,}[0-9]"

  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text, emailRe, "<EMAIL>")
    val ip = regexp_replace(email, ipRe, "<IP>")
    regexp_replace(ip, numberRunRe, "<NUMBER>")
  }

  /** Count of PII matches by kind, for corpus auditing. Counts are
    * independent per kind (an IP also matches the number-run class —
    * [[scrubPii]]'s replacement order resolves precedence; audits don't). */
  def piiCounts(text: Column): Column =
    struct(
      size(regexp_extract_all(text, lit(emailRe), lit(0))).as("n_email"),
      size(regexp_extract_all(text, lit(ipRe), lit(0))).as("n_ip"),
      size(regexp_extract_all(text, lit(numberRunRe), lit(0))).as("n_number"))

  /** Normalized-content fingerprint: md5 of (lowercased, ASCII-punctuation-
    * stripped, whitespace-collapsed) text — the exact-dedup key. Only ASCII
    * punctuation (`\p{Punct}` ≡ POSIX [[:punct:]]) is stripped: a
    * letters-only class would collapse every non-Latin document (CJK, ...)
    * to the empty fingerprint and mark them all duplicates. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "\\p{Punct}", " "), "\\s+", " ")))
}
