package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native normalized-content fingerprint: md5 of (lowercased, ASCII-
  * punctuation→space, whitespace-collapsed, trimmed) text — the exact-dedup
  * key, computed in ONE character pass instead of the two full-text regex
  * rewrites of the `regexp_replace` composition it replaces (semantics
  * identical: `\p{Punct}` = the 32 ASCII punctuation chars, `\s` =
  * `[ \t\n\x0B\f\r]`, both folded into the same collapse).
  */
case class FingerprintExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "content_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    FingerprintExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.FingerprintExpr.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FingerprintExpr {
  private def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Static helper invoked from generated code: lower → punct→space →
    * collapse `\s+` runs to one space → trim → md5 hex. Pure-ASCII input
    * (the overwhelmingly common case) runs the single fused pass; anything
    * else falls back to the exact original composition (JDK toLowerCase +
    * java.util.regex — the same engine Spark's lower/regexp_replace use),
    * so results are identical for every input. */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    var ascii = true
    var j = 0
    while (j < s.length && ascii) { if (s.charAt(j) >= 0x80) ascii = false; j += 1 }
    val norm =
      if (!ascii)
        s.toLowerCase.replaceAll("\\p{Punct}", " ").replaceAll("\\s+", " ").trim
      else {
        val sb = new java.lang.StringBuilder(s.length)
        var pendingSpace = false
        var i = 0
        while (i < s.length) {
          val c0 = s.charAt(i)
          val c = if (isPunct(c0)) ' ' else c0
          if (isWs(c)) pendingSpace = true
          else {
            if (pendingSpace && sb.length() > 0) sb.append(' ')
            pendingSpace = false
            sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
          }
          i += 1
        }
        sb.toString
      }
    UTF8String.fromString(Md5.hex(norm))
  }
}

/** Shared md5-hex helper for the native text expressions. */
private[functions] object Md5 {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexDigits = "0123456789abcdef".toCharArray

  def hex(s: String): String = {
    val d = local.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
