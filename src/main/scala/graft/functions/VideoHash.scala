package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual keyframe-sequence hash over decoded video — the video leg of
  * the dedup ladder, composing the image leg over a frame axis (the public
  * "temporally-aligned perceptual hash" family used by video-dedup
  * pipelines: sample keyframes, perceptual-hash each, combine
  * order-sensitively).
  *
  * Decodes the binary column via [[graft.operators.AviCodec]] (uncompressed
  * 24-bit DIB AVI), samples 8 keyframes at the dHash integer-division rule
  * (`frame(k) = k·nFrames/8`), computes the 56-bit luminance-gradient dHash
  * of each keyframe ([[DHashExpr.computePixels]] — all integer math), and
  * folds them into one fingerprint by XOR of per-keyframe bit-rotations:
  * `fp = ⊕ₖ rot56(dhash(frame(k)), 7·k)`. XOR preserves Hamming locality
  * (`H(a⊕c, b⊕c) = H(a, b)`), so a perturbation confined to one keyframe
  * moves the video fingerprint by exactly that keyframe's dHash delta
  * (≤ 1 bit for a single-pixel spot), and per-frame brightness invariance
  * lifts to the whole video; the per-index rotation makes the fold
  * ORDER-sensitive — the same frames reordered produce a different
  * fingerprint (plain XOR would not). 56 bits keeps the signed-int64
  * portability envelope of [[DHashExpr]]; rotation amounts 7·k ≤ 49 stay
  * inside it, and every step is integer math an oracle reproduces
  * analytically from the frame-generating functions (m07).
  */
case class VideoHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "video_khash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    VideoHashExpr.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VideoHashExpr.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoHashExpr {

  private val Keyframes = 8

  /** rotate-left within the low 56 bits; 0 ≤ s ≤ 49 and h < 2^56, so both
    * shifted halves fit a signed int64 (the DuckDB-portability envelope). */
  private def rot56(h: Long, s: Int): Long =
    ((h & ((1L << (56 - s)) - 1)) << s) | (h >>> (56 - s))

  /** Static helper invoked from generated code: AVI decode → 8 keyframe
    * dHashes → order-sensitive rotate-XOR fold. Videos shorter than 8
    * frames still hash (keyframe indices repeat under integer division). */
  def compute(bytes: Array[Byte]): Long = {
    val video = graft.operators.AviCodec.decode(bytes)
    val n = video.frames.length
    var fp = 0L
    var k = 0
    while (k < Keyframes) {
      val frame = video.frames(k * n / Keyframes)
      fp ^= rot56(
        DHashExpr.computePixels(frame.pixels, frame.width, frame.height), 7 * k)
      k += 1
    }
    fp
  }
}

/** Column-level entry points for the video-hash expression. */
object VideoHash {
  private val KHashName = "video_khash"

  /** Idempotently register [[VideoHashExpr]] in the session's function
    * registry (same pattern as [[ImageHash.registerNative]]). */
  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      KHashName, exprs => VideoHashExpr(exprs(0)), "built-in")

  /** Native codegen'd video fingerprint — call [[registerNative]] first. */
  def kHash(media: Column): Column = call_function(KHashName, media)
}
