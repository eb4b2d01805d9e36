package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): normalize → char `k`-gram hashes → keep the minimum
  * hash of each sliding window of `w` consecutive grams → distinct set.
  * Guarantees every shared substring of length ≥ k+w-1 contributes at least
  * one shared fingerprint, at ~1/w the density of full k-gram hashing — the
  * classic plagiarism/near-dup fingerprint for document-scale corpora.
  *
  * Hashes are md5 hex (engine-portable — CLAUDE.md rule 4) rather than a
  * positional Rabin rolling hash: selection semantics (min-per-window) are
  * identical, and the DuckDB oracle can mirror every byte. Normalization is
  * lower + collapse `\s+` to one space + space-trim, exactly matching
  * `trim(regexp_replace(lower(text), '\s+', ' ', 'g'))` on the SQL side.
  * Short inputs: fewer than `w` grams collapse to one window (global min);
  * fewer than `k` chars yield no fingerprints.
  */
case class WinnowingExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    WinnowingExpr.compute(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WinnowingExpr.compute($v, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowingExpr {
  private def md5Hex(s: String): String = Md5.hex(s)

  /** Static helper invoked from generated code. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    // normalize exactly like trim(regexp_replace(lower(text), '\s+', ' ', 'g')).
    // Explicit char class, NOT Java \s: RE2's \s is [ \t\n\f\r] while Java's
    // also matches \x0B (vertical tab) — the one divergence rule 4 doesn't
    // cover. (Residual caveat: toLowerCase(ROOT) vs DuckDB lower() can differ
    // on exotic non-ASCII case mappings; fine for this corpus.)
    val norm0 = text.toString.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[ \\t\\n\\f\\r]+", " ")
    var start = 0
    var end = norm0.length
    while (start < end && norm0.charAt(start) == ' ') start += 1
    while (end > start && norm0.charAt(end - 1) == ' ') end -= 1
    val norm = norm0.substring(start, end)
    val nGrams = norm.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val hashes = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) { hashes(i) = md5Hex(norm.substring(i, i + k)); i += 1 }
    val seen = new java.util.LinkedHashSet[String]()
    if (nGrams <= w) {
      var min = hashes(0)
      var j = 1
      while (j < nGrams) { if (hashes(j).compareTo(min) < 0) min = hashes(j); j += 1 }
      seen.add(min)
    } else {
      var j = 0
      val nWin = nGrams - w + 1
      while (j < nWin) {
        // O(n·w) scan; a deque gives O(n) — irrelevant next to the md5 cost
        var min = hashes(j)
        var t = j + 1
        while (t < j + w) { if (hashes(t).compareTo(min) < 0) min = hashes(t); t += 1 }
        seen.add(min)
        j += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }
}
