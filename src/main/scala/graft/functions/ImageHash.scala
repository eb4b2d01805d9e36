package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual difference hash (dHash) over a decoded image — the image leg
  * of the dedup ladder. Decodes the binary column via the format-sniffing
  * [[graft.operators.ImageCodec]] (24-bit BMP through
  * [[graft.operators.BmpCodec]], PNG through the JDK-backed
  * [[graft.operators.PngCodec]]), samples an 8×8 luminance grid
  * (nearest-neighbor: `sx = gx·w/8`, `sy = gy·h/8`, integer division) and
  * emits one bit per horizontally adjacent sample pair, set when the right
  * sample is strictly brighter — 8 rows × 7 comparisons = a 56-bit
  * fingerprint (kept under 63 bits so the value is portable as a signed
  * int64 across engines; DuckDB's BIGINT `<<` overflows at bit 63).
  *
  * Luminance is the integer mean `(r + g + b) / 3` — every step is integer
  * math, so an oracle can reproduce the fingerprint analytically from the
  * pixel-generating functions (the m03/m04 technique). Gradient-based, so
  * it is invariant to uniform brightness shifts and a single-pixel
  * perturbation flips at most one bit (only the comparisons touching that
  * sample) — near-duplicate renditions land within a small Hamming
  * distance, the property [[graft.operators.Dedup.imageNearDup]] exploits
  * with a pigeonhole block join. dHash is the public perceptual-hash
  * family (aHash/dHash/pHash) used by image-dedup pipelines; no reference
  * counterpart (`/root/reference` has no image operators).
  */
case class DHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "img_dhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    DHashExpr.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.DHashExpr.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DHashExpr {

  private def gray(px: Array[Byte], w: Int, x: Int, y: Int): Int = {
    val o = (y * w + x) * 3
    ((px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)) / 3
  }

  /** Static helper invoked from generated code: image decode (BMP or PNG,
    * magic-sniffed) → 56-bit dHash. */
  def compute(bytes: Array[Byte]): Long = {
    val img = graft.operators.ImageCodec.decode(bytes)
    computePixels(img.pixels, img.width, img.height)
  }

  /** The grid hash on already-decoded pixels — shared with the per-frame
    * video fingerprint ([[VideoHashExpr]]). */
  def computePixels(px: Array[Byte], w: Int, h: Int): Long = {
    var fp = 0L
    var gy = 0
    while (gy < 8) {
      val sy = gy * h / 8
      var prev = gray(px, w, 0, sy) // sx(0) = 0
      var gx = 0
      while (gx < 7) {
        val cur = gray(px, w, (gx + 1) * w / 8, sy)
        if (cur > prev) fp |= 1L << (gy * 7 + gx)
        prev = cur
        gx += 1
      }
      gy += 1
    }
    fp
  }
}

/** Column-level entry points for the image-hash expressions. */
object ImageHash {
  private val DHashName = "img_dhash"

  /** Idempotently register [[DHashExpr]] in the session's function registry
    * (same pattern as [[TextFunctions.registerNative]]). */
  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DHashName, exprs => DHashExpr(exprs(0)), "built-in")

  /** Native codegen'd perceptual hash — call [[registerNative]] first. */
  def dHash(media: Column): Column = call_function(DHashName, media)
}
