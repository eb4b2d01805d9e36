package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word n-gram shingling: trim → split on `\s+` → space-join
  * each n-gram → distinct (first-occurrence order). Semantics identical to
  * the `split`/`zip_with`/`array_distinct` composition it replaces, but those
  * higher-order functions evaluate interpreted per row (lambda binding per
  * element, outside whole-stage codegen); this expression runs one tight JVM
  * loop per row and its generated call stays inside the codegen'd stage —
  * the [[SignLsh]] pattern applied to the dedup ladder's hottest input.
  */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 2, "use tokens() for 1-grams")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    WordShinglesExpr.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordShinglesExpr.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesExpr {
  private val Ws = "\\s+".r.pattern

  /** Static helper invoked from generated code — one allocation-lean pass.
    * Trim is SPACE-ONLY and split uses limit -1, mirroring Spark's
    * `trim`/`split` exactly (Java's `String.trim` strips all ctrl chars —
    * different tokens when text carries tabs/newlines). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    if (start == end) return new GenericArrayData(Array.empty[Any])
    val toks = Ws.split(s.subSequence(start, end), -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val m = toks.length - n + 1
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
