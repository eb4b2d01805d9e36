package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Two-level (coarse → fine) centroid assignment — the O(n·√nlist) escape
  * from flat assignment's O(n·nlist) when `nlist` scales with the corpus
  * (the structural cost flagged on v06's sf1new scaling point).
  *
  * Per row: score the ~√nlist SUPER-centroids, take the best `probeSupers`,
  * then score only the member centroids of those supers — one fused JVM
  * call, all matrices reference objects (the [[NearestCellsExpr]] pattern).
  * Work per row is |supers| + probeSupers·(nlist/|supers|) instead of nlist.
  *
  * APPROXIMATE by design: a vector whose true cell hides in an unprobed
  * super is assigned to the best probed cell — the standard IVF coarse-
  * quantizer trade (raise `probeSupers` for agreement, lower for speed).
  * SimilarityHierarchySpec pins agreement vs flat assignment on real
  * embeddings. Output type/order contract matches [[NearestCellsExpr]]:
  * `array<struct<a, cell>>`, (a desc, cell desc), so the two are drop-in
  * interchangeable upstream.
  *
  * `memberCents` must be ordered by super: `groupOffsets(g)` is the first
  * member row of super `g` (length |supers|+1); `memberCellIds(i)` maps a
  * member row back to its flat cell id.
  */
case class HierarchicalCellsExpr(child: Expression,
                                 superCents: Array[Double],
                                 memberCents: Array[Double],
                                 memberCellIds: Array[Int],
                                 groupOffsets: Array[Int],
                                 dims: Int, probeSupers: Int, take: Int)
    extends UnaryExpression {

  require(dims > 0 && superCents.length % dims == 0 &&
    memberCents.length % dims == 0, "matrix length must be a multiple of dims")
  require(groupOffsets.length == superCents.length / dims + 1 &&
    groupOffsets.last == memberCellIds.length,
    "groupOffsets must fence |supers| groups over the member rows")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", DoubleType, nullable = false),
      StructField("cell", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "hierarchical_cells"

  override def nullSafeEval(v: Any): Any =
    HierarchicalCellsExpr.compute(v.asInstanceOf[ArrayData], superCents,
      memberCents, memberCellIds, groupOffsets, dims, probeSupers, take)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("superCents", superCents, "double[]")
    val mRef = ctx.addReferenceObj("memberCents", memberCents, "double[]")
    val idRef = ctx.addReferenceObj("memberCellIds", memberCellIds, "int[]")
    val offRef = ctx.addReferenceObj("groupOffsets", groupOffsets, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HierarchicalCellsExpr.compute(
         |  $c, $sRef, $mRef, $idRef, $offRef, $dims, $probeSupers, $take);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HierarchicalCellsExpr {

  private def cosRow(v: ArrayData, vNormSq: Double, m: Array[Double],
                     row: Int, dims: Int): Double = {
    val off = row * dims
    val n = math.min(v.numElements(), dims)
    var dot = 0.0; var nx = 0.0
    var j = 0
    while (j < n) {
      val xj = m(off + j); val yj = v.getDouble(j)
      dot += xj * yj; nx += xj * xj
      j += 1
    }
    if (nx == 0.0 || vNormSq == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(vNormSq))
  }

  def compute(v: ArrayData, superCents: Array[Double], memberCents: Array[Double],
              memberCellIds: Array[Int], groupOffsets: Array[Int],
              dims: Int, probeSupers: Int, take: Int): ArrayData = {
    val nSup = superCents.length / dims
    var ny = 0.0
    var i = 0
    while (i < math.min(v.numElements(), dims)) {
      val x = v.getDouble(i); ny += x * x; i += 1
    }
    // stage 1: rank supers
    val sCos = new Array[Double](nSup)
    var s = 0
    while (s < nSup) { sCos(s) = cosRow(v, ny, superCents, s, dims); s += 1 }
    val sOrder = Array.range(0, nSup).sortWith { (a, b) =>
      if (sCos(a) != sCos(b)) sCos(a) > sCos(b) else a > b
    }
    // stage 2: score members of the probed supers
    val probes = math.min(probeSupers, nSup)
    var cand = 0
    var p = 0
    while (p < probes) {
      cand += groupOffsets(sOrder(p) + 1) - groupOffsets(sOrder(p)); p += 1
    }
    val cCos = new Array[Double](cand)
    val cCell = new Array[Int](cand)
    var w = 0
    p = 0
    while (p < probes) {
      val g = sOrder(p)
      var r = groupOffsets(g)
      while (r < groupOffsets(g + 1)) {
        cCos(w) = cosRow(v, ny, memberCents, r, dims)
        cCell(w) = memberCellIds(r)
        w += 1; r += 1
      }
      p += 1
    }
    val order = Array.range(0, cand).sortWith { (a, b) =>
      if (cCos(a) != cCos(b)) cCos(a) > cCos(b) else cCell(a) > cCell(b)
    }
    val k = math.min(take, cand)
    val rows = new Array[Any](k)
    var r = 0
    while (r < k) {
      rows(r) = InternalRow(cCos(order(r)), cCell(order(r)))
      r += 1
    }
    new GenericArrayData(rows)
  }
}
