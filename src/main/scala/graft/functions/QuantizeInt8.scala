package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native int8 symmetric max-abs quantization of a double array →
  * struct(scale double, q_csv string).
  *
  * Quantization is a bulk full-corpus pass at 100 TB embedding scale, and the
  * built-in composition (`aggregate` for max-abs + `transform` for the
  * per-element floor) evaluates INTERPRETED per row even inside a codegen'd
  * stage — the repo's measured 2-3× HOF penalty (CLAUDE.md perf notes). This
  * expression is the [[CosineSimilarity]]/[[WinnowingExpr]] treatment: one
  * static JVM call from generated code, one tight loop, no per-element
  * boxing.
  *
  * Semantics are EXACTLY the HOF composition it replaces (v05 oracle-green):
  * maxabs = sequential max of |x|; scale = maxabs/127 (0.0 when maxabs = 0);
  * q_i = floor(x_i/scale + 0.5) — floor(+0.5) spelled out because library
  * `round` half-way rules differ across engines and quantization hits exact
  * .5 boundaries. CSV string output (driver checker can't hash arrays);
  * empty array → scale 0.0, q_csv "".
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = new StructType()
    .add("scale", DoubleType, nullable = false)
    .add("q_csv", StringType, nullable = false)
  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(v: Any): Any =
    QuantizeInt8.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.QuantizeInt8.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Vector twin of [[QuantizeInt8]]: the quantized components as
  * `array<double>` of exact integer values (same maxabs/127 scale,
  * same floor(x/scale + 0.5) rule) — the SQ8 representation the int8
  * brute-force scorer (v14) ranks on. Integer values in doubles keep
  * every downstream fold ([[CosineSimilarity]]'s sequential dot/norms)
  * exact integer arithmetic far below 2^53, hence bit-identical across
  * engines — the v11 insight applied to the SCORING domain. */
case class QuantizeInt8Vec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantize_int8_vec"

  override def nullSafeEval(v: Any): Any =
    QuantizeInt8.computeVec(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.QuantizeInt8.computeVec($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {
  /** Static helper for [[QuantizeInt8Vec]]: quantized components as exact
    * integer-valued doubles. */
  def computeVec(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = java.lang.Math.abs(arr.getDouble(i))
      if (a > maxabs) maxabs = a
      i += 1
    }
    val scale = if (maxabs == 0.0) 0.0 else maxabs / 127
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = if (scale == 0.0) 0.0
               else java.lang.Math.floor(arr.getDouble(i) / scale + 0.5)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Static helper invoked from generated code. */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = java.lang.Math.abs(arr.getDouble(i))
      if (a > maxabs) maxabs = a
      i += 1
    }
    val scale = if (maxabs == 0.0) 0.0 else maxabs / 127
    val sb = new java.lang.StringBuilder(n * 4)
    i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      if (scale == 0.0) sb.append('0')
      else sb.append(java.lang.Math.floor(arr.getDouble(i) / scale + 0.5).toLong)
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, UTF8String.fromString(sb.toString)))
  }
}
