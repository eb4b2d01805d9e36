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

/** Per-frame energy profile of decoded AUDIO at a caller-chosen frame width
  * — the measurement under voice-activity / silence segmentation, the
  * speech-curation primitive that bounds every downstream per-segment cost
  * (ASR, diarization, chunked storage). Audio twin of [[FrameEnergyExpr]]:
  * decodes 16-bit PCM WAV ([[graft.operators.WavCodec]]), splits the sample
  * stream into consecutive frames of exactly `spf` samples (trailing
  * partial frame dropped — documented envelope), and emits Σ|sample| per
  * frame as int64 — integer-exact (≤ 32768·spf), analytically reproducible
  * from sample-generating functions (the m06/m07 oracle contract). The
  * activity threshold and the gaps-and-islands run grouping stay
  * RELATIONAL, so the detector policy is visible/swappable in the plan;
  * media bytes never leave the scan stage — the profile is frames × 8
  * bytes. `spf` must be a foldable positive integer. */
case class AudioFrameEnergiesExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "audio_frame_energies"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, org.apache.spark.sql.types.IntegerType)
        if right.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, foldable int)")
    }

  override def nullSafeEval(media: Any, spf: Any): Any =
    AudioFrameEnergiesExpr.compute(
      media.asInstanceOf[Array[Byte]], spf.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, s) =>
      s"${ev.value} = graft.functions.AudioFrameEnergiesExpr.compute($m, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AudioFrameEnergiesExpr {

  /** Static helper invoked from generated code: WAV decode → int64 Σ|s|
    * per spf-sample frame (trailing partial frame dropped). */
  def compute(bytes: Array[Byte], spf: Int): ArrayData = {
    require(spf > 0, s"samples-per-frame must be positive, got $spf")
    val s = graft.operators.WavCodec.decode(bytes).samples
    val nFrames = s.length / spf
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      var e = 0L
      var i = f * spf
      val end = i + spf
      while (i < end) { e += math.abs(s(i).toLong); i += 1 }
      out(f) = e
      f += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-level entry points for the frame-energy expressions. */
object FrameEnergy {
  private val Name = "frame_energy"
  private val AudioName = "audio_frame_energies"

  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => FrameEnergyExpr(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      AudioName, exprs => AudioFrameEnergiesExpr(exprs(0), exprs(1)), "built-in")
  }

  /** Native codegen'd per-frame energy — call [[registerNative]] first. */
  def frameEnergy(media: Column): Column = call_function(Name, media)

  /** Native codegen'd per-frame audio energies at `spf` samples/frame —
    * call [[registerNative]] first. */
  def audioFrameEnergies(media: Column, spf: Int): Column =
    call_function(AudioName, media, org.apache.spark.sql.functions.lit(spf))
}
