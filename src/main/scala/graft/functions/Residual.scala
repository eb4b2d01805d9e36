package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Residual of an embedding against its assigned IVF centroid:
  * `r[i] = v[i] − cents[cell·dims + i]` — the vector FAISS-style IVF-PQ
  * quantizes instead of the raw embedding (residuals cluster around the
  * origin, so one small codebook covers every cell; Jégou et al. 2011 §IV).
  *
  * Centroid matrix rides as ONE codegen reference object (the
  * [[NearestCellsExpr]] pattern) with a fused subtraction loop — a
  * `zip_with` against a per-cell literal array would evaluate interpreted
  * per row and need nlist plan branches. Missing tail components of short
  * vectors read as 0.0 (the [[PqEncodeExpr]] convention), so the output is
  * always exactly `dims` long. Each component is ONE exact IEEE subtract of
  * doubles an oracle reproduces verbatim (`emb[i] - cemb[i]`).
  */
case class ResidualExpr(left: Expression, right: Expression,
                        cents: Array[Double], dims: Int)
    extends BinaryExpression {
  require(dims > 0 && cents.length % dims == 0,
    s"centroid matrix length ${cents.length} not a multiple of dims=$dims")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "residual_vec"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(v: Any, cell: Any): Any =
    ResidualExpr.compute(v.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], cents, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.ResidualExpr.compute($v, $c, $ref, $dims);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ResidualExpr {
  def compute(v: ArrayData, cell: Int, cents: Array[Double],
              dims: Int): ArrayData = {
    val off = cell * dims
    require(off >= 0 && off + dims <= cents.length,
      s"cell $cell outside the ${cents.length / dims}-cell centroid matrix")
    val vn = v.numElements()
    val out = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      val x = if (i < vn) v.getDouble(i) else 0.0
      out(i) = x - cents(off + i)
      i += 1
    }
    new GenericArrayData(out)
  }
}
