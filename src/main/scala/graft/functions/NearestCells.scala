package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native centroid-assignment: cosine of a vector against a whole centroid
  * matrix, returning the top-`take` cells as `array<struct<a:double,
  * cell:int>>` sorted by (a DESC, cell DESC) — exactly the contract of the
  * `array_sort`/`reverse` composition it replaces in `Similarity.topCellsOf`.
  *
  * Why native: the literal-centroid composition builds `nlist` structs and
  * sorts them per row in INTERPRETED evaluation (HOFs and array_sort sit
  * outside codegen — the repo's measured 2-3x lesson, but multiplied by
  * nlist here). Measured on the sf1new scaling run: v06's 10x point was
  * 27x slower with nlist=160 through the interpreted path. This expression
  * keeps the centroid matrix as ONE flat reference object (the SignLsh
  * pattern) and runs a single fused JVM loop per row: O(nlist·dims) mults +
  * an O(nlist log nlist) sort of primitive pairs.
  *
  * Cosine is the same strictly-sequential fold as [[CosineSimilarity]]
  * (dot / (√nx·√ny), 0 on zero norms) so cell assignment stays bit-identical
  * to the DuckDB oracles of v04/v06.
  */
case class NearestCellsExpr(child: Expression, cents: Array[Double],
                            dims: Int, take: Int)
    extends UnaryExpression {

  require(dims > 0 && cents.length % dims == 0,
    s"centroid matrix length ${cents.length} not a multiple of dims=$dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", DoubleType, nullable = false),
      StructField("cell", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(v: Any): Any =
    NearestCellsExpr.compute(v.asInstanceOf[ArrayData], cents, dims, take)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCellsExpr.compute($c, $ref, $dims, $take);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCellsExpr {
  /** Top-`take` (cos, cell) pairs, sorted by (cos desc, cell desc). */
  def compute(v: ArrayData, cents: Array[Double], dims: Int, take: Int): ArrayData = {
    val nlist = cents.length / dims
    val vn = v.numElements()
    var ny = 0.0
    var i = 0
    while (i < math.min(vn, dims)) { val x = v.getDouble(i); ny += x * x; i += 1 }
    val cos = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val off = c * dims
      val n = math.min(vn, dims)
      var dot = 0.0; var nx = 0.0
      var j = 0
      while (j < n) {
        val xj = cents(off + j); val yj = v.getDouble(j)
        dot += xj * yj; nx += xj * xj
        j += 1
      }
      cos(c) = if (nx == 0.0 || ny == 0.0) 0.0
               else dot / (math.sqrt(nx) * math.sqrt(ny))
      c += 1
    }
    // selection: (cos desc, cell desc); nlist is small — full index sort
    val order = Array.range(0, nlist).sortWith { (a, b) =>
      if (cos(a) != cos(b)) cos(a) > cos(b) else a > b
    }
    val k = math.min(take, nlist)
    val rows = new Array[Any](k)
    var r = 0
    while (r < k) {
      rows(r) = InternalRow(cos(order(r)), order(r))
      r += 1
    }
    new GenericArrayData(rows)
  }
}
