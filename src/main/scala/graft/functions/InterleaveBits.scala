package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Morton (z-order) code: interleave the bits of two non-negative
  * 32-bit ints into one long — `z` bit `2i` is `a` bit `i`, bit `2i+1` is
  * `b` bit `i`.
  *
  * Sorting by the z-code clusters rows so that BOTH dimensions are locally
  * dense: any row group covers a small square of (a, b) space instead of a
  * thin slice of the leading sort key, so parquet min/max stats prune scans
  * filtering on EITHER column (ZOrderSpec pins it, negative control
  * included). This is the layout trick behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY` — here as a plain codegen'd expression
  * ([[graft.ops.ZOrder]] composes it into a clustered write).
  *
  * Bit-spreading uses the standard magic-mask ladder (5 shift+mask steps per
  * operand, no loop, no branches) via a static JVM helper — the
  * WordShinglesExpr pattern: `nullSafeCodeGen` emitting one static call.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == IntegerType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.morton(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.InterleaveBits.morton($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the 32 bits of `v` to the even bit positions of a long. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Morton code: `a` on even bits, `b` on odd bits. */
  def morton(a: Int, b: Int): Long = spread(a) | (spread(b) << 1)
}
