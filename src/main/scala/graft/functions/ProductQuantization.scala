package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the memory lever for 100 TB ANN (Jégou,
  * Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011; the FAISS IVF-PQ workhorse). The embedding space is split
  * into `m` subspaces of `dsub` dims; each sub-vector is quantized to its
  * nearest of `ksub` codebook entries (L2, ties to the lower code), so a
  * 64-dim float64 vector (512 B) becomes `m` 4-bit codes — one BIGINT-safe
  * long (here m=8, ksub=16 → 32 bits, a 128× in-memory compression; 64× vs
  * float32). Search is ASYMMETRIC distance computation (ADC): per query,
  * one `m×ksub` table of exact sub-distances ([[PqDistTableExpr]]), then
  * each corpus CODE scores with `m` table lookups ([[PqAdcExpr]]) — the
  * corpus vectors themselves are never touched at query time.
  *
  * Every fold is strictly sequential (d ascending within a subspace, then
  * subspace-partial sums added m-ascending), so a DuckDB oracle reproduces
  * distances bit-identically via `list_sum` comprehensions in the same
  * order — the v03/v04 technique; assignment ties break to the lower code
  * like `row_number ... ORDER BY d, c`.
  *
  * Codebook layout: flat row-major `cb[(sub·ksub + code)·dsub + d]`. All
  * three expressions carry it as a codegen reference object (the
  * [[NearestCellsExpr]] pattern — one JVM array, fused loops, no
  * interpreted HOFs in the hot path).
  */
case class PqEncodeExpr(child: Expression, cb: Array[Double],
                        m: Int, ksub: Int, dsub: Int) extends UnaryExpression {
  require(m > 0 && ksub > 1 && ksub <= 16 && dsub > 0,
    s"bad PQ geometry m=$m ksub=$ksub dsub=$dsub (codes are 4-bit nibbles)")
  require(cb.length == m * ksub * dsub,
    s"codebook length ${cb.length} != $m*$ksub*$dsub")
  require(m * 4 <= 60, s"code width ${m * 4} bits exceeds the int64 envelope")

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    PqEncodeExpr.compute(v.asInstanceOf[ArrayData], cb, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqEncodeExpr.compute($c, $ref, $m, $ksub, $dsub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpr {
  /** Pack the argmin code of every subspace into nibbles of one long.
    * Missing tail components (short vectors) read as 0.0. */
  def compute(v: ArrayData, cb: Array[Double], m: Int, ksub: Int, dsub: Int): Long = {
    val vn = v.numElements()
    var code = 0L
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = subDist(v, vn, cb, sub, 0, ksub, dsub)
      var c = 1
      while (c < ksub) {
        val d = subDist(v, vn, cb, sub, c, ksub, dsub)
        if (d < bestD) { best = c; bestD = d } // strict: ties keep lower code
        c += 1
      }
      code |= best.toLong << (4 * sub)
      sub += 1
    }
    code
  }

  /** Sequential-d L2² between sub-vector `sub` of v and codebook entry
    * (sub, c) — the fold the oracle mirrors term-by-term. */
  private[functions] def subDist(v: ArrayData, vn: Int, cb: Array[Double],
                                 sub: Int, c: Int, ksub: Int, dsub: Int): Double = {
    val off = (sub * ksub + c) * dsub
    var acc = 0.0
    var d = 0
    while (d < dsub) {
      val i = sub * dsub + d
      val x = if (i < vn) v.getDouble(i) else 0.0
      val diff = x - cb(off + d)
      acc += diff * diff
      d += 1
    }
    acc
  }
}

/** Per-query ADC distance table: `m·ksub` exact sub-distances, laid out
  * `t[sub·ksub + code]` — computed once per query row, then every corpus
  * code scores with `m` lookups. See [[PqEncodeExpr]] for the fold and
  * codebook-layout contract. */
case class PqDistTableExpr(child: Expression, cb: Array[Double],
                           m: Int, ksub: Int, dsub: Int) extends UnaryExpression {
  require(m > 0 && ksub > 1 && ksub <= 16 && dsub > 0,
    s"bad PQ geometry m=$m ksub=$ksub dsub=$dsub (codes are 4-bit nibbles)")
  require(cb.length == m * ksub * dsub,
    s"codebook length ${cb.length} != $m*$ksub*$dsub")
  require(m * 4 <= 60, s"code width ${m * 4} bits exceeds the int64 envelope")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_dist_table"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    PqDistTableExpr.compute(v.asInstanceOf[ArrayData], cb, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqDistTableExpr.compute($c, $ref, $m, $ksub, $dsub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqDistTableExpr {
  def compute(v: ArrayData, cb: Array[Double], m: Int, ksub: Int, dsub: Int): ArrayData = {
    val vn = v.numElements()
    val t = new Array[Double](m * ksub)
    var sub = 0
    while (sub < m) {
      var c = 0
      while (c < ksub) {
        t(sub * ksub + c) = PqEncodeExpr.subDist(v, vn, cb, sub, c, ksub, dsub)
        c += 1
      }
      sub += 1
    }
    new GenericArrayData(t)
  }
}

/** ADC score of one corpus code against one query's distance table: the
  * m-ascending sum of table lookups (subspace-partial sums added in index
  * order — the grouping the oracle's `list_sum(list(d ORDER BY m))`
  * reproduces exactly). */
case class PqAdcExpr(left: Expression, right: Expression,
                     m: Int, ksub: Int) extends BinaryExpression {
  require(m > 0 && ksub > 1 && ksub <= 16,
    s"bad PQ geometry m=$m ksub=$ksub (codes are 4-bit nibbles)")
  require(m * 4 <= 60, s"code width ${m * 4} bits exceeds the int64 envelope")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, bigint), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(t: Any, code: Any): Any =
    PqAdcExpr.compute(t.asInstanceOf[ArrayData], code.asInstanceOf[Long], m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.functions.PqAdcExpr.compute($t, $c, $m, $ksub);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcExpr {
  def compute(t: ArrayData, code: Long, m: Int, ksub: Int): Double = {
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      acc += t.getDouble(sub * ksub + ((code >> (4 * sub)) & 0xf).toInt)
      sub += 1
    }
    acc
  }
}
