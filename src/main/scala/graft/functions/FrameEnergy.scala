package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Per-frame energy profile of a decoded video — the measurement under
  * shot-boundary (scene-cut) detection, the standard first step of
  * keyframe selection in video curation pipelines: a cut shows as a jump
  * in consecutive-frame difference, while in-scene motion moves the
  * profile slowly (public pixel-domain shot-detection family; the
  * threshold-on-frame-difference formulation goes back to Zhang et al.
  * 1993).
  *
  * Emits one int64 per frame: the sum of all channel bytes (Σ r+g+b over
  * pixels) of [[graft.operators.AviCodec]]'s top-down RGB frames —
  * integer-exact, ≤ 255·3·w·h per frame, so an oracle reproduces it
  * analytically from the frame-generating functions (the m07 contract).
  * Differencing/thresholding stays in the plan (relational `lag`), so the
  * detector's policy is visible and swappable; only this per-frame
  * reduction needs the native loop — the media bytes never leave the scan
  * stage, the profile is frames × 8 bytes.
  */
case class FrameEnergyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "frame_energy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    FrameEnergyExpr.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.FrameEnergyExpr.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrameEnergyExpr {

  /** Static helper invoked from generated code: AVI decode → one int64
    * channel-byte sum per frame. */
  def compute(bytes: Array[Byte]): ArrayData = {
    val video = graft.operators.AviCodec.decode(bytes)
    val out = new Array[Long](video.frames.length)
    var f = 0
    while (f < video.frames.length) {
      val px = video.frames(f).pixels
      var s = 0L
      var i = 0
      while (i < px.length) { s += (px(i) & 0xff); i += 1 }
      out(f) = s
      f += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-level entry points for the frame-energy expression. */
object FrameEnergy {
  private val Name = "frame_energy"

  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => FrameEnergyExpr(exprs(0)), "built-in")

  /** Native codegen'd per-frame energy — call [[registerNative]] first. */
  def frameEnergy(media: Column): Column = call_function(Name, media)
}
