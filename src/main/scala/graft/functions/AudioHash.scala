package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual energy-difference hash over decoded audio — the audio leg of
  * the dedup ladder, the time-domain member of the energy-difference
  * fingerprint family (Haitsma–Kalker's "robust audio fingerprint" computes
  * band-energy differences; this is the band-free variant, chosen so every
  * step is integer math an oracle can reproduce analytically from the
  * sample-generating functions — the m03/m04 technique applied to audio).
  *
  * Decodes the binary column via [[graft.operators.WavCodec]] (16-bit PCM
  * WAV), splits the sample stream into 57 frames (nearest-neighbor
  * boundaries `f·n/57`, integer division — the dHash sampling rule), sums
  * `|sample|` per frame in int64, and emits one bit per adjacent frame
  * pair, set when the later frame is strictly louder — 56 comparisons = a
  * 56-bit fingerprint (kept under 63 bits for signed-int64 portability,
  * same envelope as [[DHashExpr]]).
  *
  * Gradient-of-energy is invariant to exact positive gain scaling (integer
  * gain ⇒ frame sums scale exactly ⇒ comparisons unchanged) — the audio
  * analog of dHash's brightness invariance — and a perturbation confined to
  * one frame flips at most the two comparisons touching it, so renditions
  * land within a small Hamming distance and pair under
  * [[graft.operators.Dedup.audioNearDup]]'s pigeonhole block join.
  */
case class AudioHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "audio_ehash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    AudioHashExpr.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.AudioHashExpr.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioHashExpr {

  private val Frames = 57 // 56 adjacent-pair bits

  /** Static helper invoked from generated code: WAV decode → 57 frame
    * energies → 56-bit energy-gradient fingerprint. Inputs shorter than one
    * sample per frame still hash (empty frames sum to 0). */
  def compute(bytes: Array[Byte]): Long = {
    val audio = graft.operators.WavCodec.decode(bytes)
    val s = audio.samples
    val n = s.length
    var fp = 0L
    var prev = frameEnergy(s, 0L, n.toLong / Frames)
    var f = 1
    while (f <= Frames - 1) {
      val lo = f.toLong * n / Frames
      val hi = (f + 1).toLong * n / Frames
      val cur = frameEnergy(s, lo, hi)
      if (cur > prev) fp |= 1L << (f - 1)
      prev = cur
      f += 1
    }
    fp
  }

  private def frameEnergy(s: Array[Short], lo: Long, hi: Long): Long = {
    var e = 0L
    var i = lo.toInt
    val end = hi.toInt
    while (i < end) {
      e += math.abs(s(i).toLong)
      i += 1
    }
    e
  }
}

/** Column-level entry points for the audio-hash expression. */
object AudioHash {
  private val EHashName = "audio_ehash"

  /** Idempotently register [[AudioHashExpr]] in the session's function
    * registry (same pattern as [[ImageHash.registerNative]]). */
  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      EHashName, exprs => AudioHashExpr(exprs(0)), "built-in")

  /** Native codegen'd audio fingerprint — call [[registerNative]] first. */
  def eHash(media: Column): Column = call_function(EHashName, media)
}
