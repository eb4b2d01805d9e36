package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher's most-repeated-bigram character fraction (Rae et al. 2021
  * App. A "duplicate n-gram character fraction" family): the characters
  * covered by the single most frequent word bigram, as a fraction of the
  * document's characters.
  *
  * Bit-identical to the HOF composition it replaces in
  * `TextQueries.gopherStatCols` —
  * `array_max(transform(array_distinct(g2), x => size(filter(g2, y => y ===
  * x)) * length(x))) / length(text)` — but that form is QUADRATIC in the
  * bigram count and evaluates interpreted per row; on a single-partition
  * streaming micro-batch (s21's shape: one file per trigger, no shuffle
  * before the gate) it was measured at ~3.4 ms/doc single-threaded, 17 s
  * of the 20 s drain. One hash-counting pass is O(bigrams) and stays
  * inside the codegen'd stage (the WordShinglesExpr pattern). Tokenization
  * mirrors Spark's `trim`/`split('\\s+')` exactly (space-only trim, limit
  * -1 — leading separator yields an empty first token); lengths count
  * CODEPOINTS to match Spark's `length`; the max is integer, the single
  * final division is the same two doubles either way.
  */
case class TopBigramFracExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "top_bigram_frac"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TopBigramFracExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TopBigramFracExpr.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopBigramFracExpr {
  private val Ws = "\\s+".r.pattern

  /** Static helper invoked from generated code. */
  def compute(text: UTF8String): Double = {
    val s = text.toString
    val textChars = s.codePointCount(0, s.length)
    if (textChars == 0) return 0.0
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    if (start == end) return 0.0 // tokens() maps all-space text to []
    val toks = Ws.split(s.subSequence(start, end), -1)
    if (toks.length < 2) return 0.0
    val counts = new java.util.HashMap[String, Integer](toks.length * 2)
    var best = 0L
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < toks.length - 1) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      val g = sb.toString
      val c = counts.merge(g, 1, (a, b) => a + b)
      val chars = g.codePointCount(0, g.length)
      val v = c.toLong * chars
      if (v > best) best = v
      i += 1
    }
    best.toDouble / textChars
  }
}

/** Column-level entry points. */
object TopBigramFrac {
  private val Name = "top_bigram_frac"

  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => TopBigramFracExpr(exprs(0)), "built-in")

  def topBigramFrac(text: Column): Column = call_function(Name, text)
}
