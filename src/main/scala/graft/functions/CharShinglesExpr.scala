package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DISTINCT character n-grams over normalized text — the input
  * relation of corpus-statistical quality scoring (d25): character-level
  * n-gram document frequency is the standard gibberish/noise signal (a
  * document whose trigrams are rare corpus-wide is mojibake, hex dumps, or
  * boilerplate markup, whatever its word-level stats say — the CCNet/
  * fastText-family lexical filter re-expressed relationally).
  *
  * Normalization is the repo's pinned envelope (lower → collapse
  * `[ \t\n\f\r]+` to one space → space-trim, exactly
  * `trim(regexp_replace(lower(text), '[ \t\n\f\r]+', ' ', 'g'))` — the
  * [[WinnowingExpr]]/[[CdcChunksExpr]] rule, RE2-safe). Distinct
  * first-occurrence order, one tight JVM loop per row inside the codegen'd
  * stage (the [[WordShinglesExpr]] pattern at char level).
  *
  * N-grams slice by CODEPOINT, not UTF-16 code unit, so non-BMP characters
  * (emoji, supplementary CJK) are never split across surrogate halves —
  * matching DuckDB's codepoint-based `substring`. The remaining oracle
  * contract is the lowercasing step: `toLowerCase(Locale.ROOT)` and DuckDB
  * `lower()` agree on ASCII and the common Latin-1 range but can diverge on
  * locale-special casings (e.g. dotted capital İ → "i̇" two-codepoint
  * expansion both sides handle differently) — exact hash parity is
  * guaranteed on text whose uppercase letters are 1:1 simple mappings,
  * which includes all repo testdata.
  */
case class CharShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 2, s"char shingles need n >= 2, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    CharShinglesExpr.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CharShinglesExpr.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShinglesExpr {
  /** Static helper invoked from generated code: normalize → distinct char
    * n-grams in first-occurrence order. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val norm0 = text.toString.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[ \\t\\n\\f\\r]+", " ")
    var start = 0
    var end = norm0.length
    while (start < end && norm0.charAt(start) == ' ') start += 1
    while (end > start && norm0.charAt(end - 1) == ' ') end -= 1
    val norm = norm0.substring(start, end)
    // slice by codepoint: cps(k) = char index where codepoint k starts
    val cpCount = norm.codePointCount(0, norm.length)
    val count = cpCount - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val cps = new Array[Int](cpCount + 1)
    var ci = 0
    var k = 0
    while (ci < norm.length) {
      cps(k) = ci
      ci += Character.charCount(norm.codePointAt(ci))
      k += 1
    }
    cps(cpCount) = norm.length
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      seen.add(norm.substring(cps(i), cps(i + n)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
